package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-series) join — attach to every left row the most recent
  * right row at-or-before its timestamp on the same series key,
  * optionally within a tolerance. The telemetry workhorse join
  * (exemplar → nearest sample, log line → active deploy, span → most
  * recent config) that neither Spark nor the reference's SQL templates
  * ship as a primitive.
  *
  * Spark-first shape: NOT a range join — `l.ts >= r.ts` as a join
  * condition degenerates to a per-key cross product that no amount of
  * pruning saves at 100 TB. Instead the classic UNION + ordered-window
  * form: tag both sides, union them, and take per key the running
  * `last` right-payload over rows ordered by (ts, side) — right rows
  * sort before left rows at an equal timestamp, so "at-or-before"
  * includes exact-tie matches. Cost: ONE shuffle of |L|+|R| rows on the
  * series key + one sort within partitions, zero row expansion; the
  * plan a 1000-executor cluster runs unchanged (per-series skew is the
  * usual salting caveat). Determinism: right-side ties on (key, ts)
  * are collapsed BEFORE the union (greatest `tieBreak` wins), so any
  * engine replays the identical match — DuckDB's native ASOF JOIN
  * serves as the independent oracle in the catalog row.
  */
object AsofJoin {

  /** backward as-of join: greatest right.ts <= left.ts per key.
    *
    * @param payloadCols  right columns carried onto matches, emitted as
    *                     `asof_<name>` (plus `asof_ts`, the matched ts)
    * @param tieBreak     right column deciding ties on (key, ts)
    * @param toleranceMs  matches older than this are nulled out
    */
  def backward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payloadCols: Seq[String],
      tieBreak: String, toleranceMs: Long = Long.MaxValue): DataFrame =
    join0(left, right, keyCol, leftTs, rightTs, payloadCols, tieBreak,
      toleranceMs, dir = 1L)

  /** forward as-of join: smallest right.ts >= left.ts per key — the
    * time-mirror of [[backward]] (sort on negated timestamps), same
    * single-shuffle plan and determinism rules.
    */
  def forward(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payloadCols: Seq[String],
      tieBreak: String, toleranceMs: Long = Long.MaxValue): DataFrame =
    join0(left, right, keyCol, leftTs, rightTs, payloadCols, tieBreak,
      toleranceMs, dir = -1L)

  /** Skew-resistant backward as-of join — the hot-series answer to
    * [[backward]]'s one caveat: a key owning most of the rows funnels
    * its whole series through ONE task's window. Here time additionally
    * splits into `bucketMs` buckets and the window partitions on
    * (key, bucket), so no task ever sees more than one bucket of one
    * key. Cross-bucket matches are recovered by a SECOND, tiny window
    * over the per-(key, bucket) summary frame (one row per non-empty
    * bucket — bounded by time range / bucketMs per key, not by rows):
    * carry = the latest right payload of any EARLIER bucket, joined
    * back on (key, bucket) and used when the local window finds nothing.
    * Semantics are exactly [[backward]]'s (property-tested equal),
    * including right-before-left tie order and the tolerance gate.
    */
  def backwardBucketed(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payloadCols: Seq[String],
      tieBreak: String, bucketMs: Long,
      toleranceMs: Long = Long.MaxValue): DataFrame =
    bucketed0(left, right, keyCol, leftTs, rightTs, payloadCols, tieBreak,
      bucketMs, toleranceMs, dir = 1L)

  /** time-mirror of [[backwardBucketed]]: smallest right.ts >= left.ts,
    * same (key, bucket) skew resistance */
  def forwardBucketed(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payloadCols: Seq[String],
      tieBreak: String, bucketMs: Long,
      toleranceMs: Long = Long.MaxValue): DataFrame =
    bucketed0(left, right, keyCol, leftTs, rightTs, payloadCols, tieBreak,
      bucketMs, toleranceMs, dir = -1L)

  private def bucketed0(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payloadCols: Seq[String],
      tieBreak: String, bucketMs: Long,
      toleranceMs: Long, dir: Long): DataFrame = {
    val rv = struct(col(rightTs).cast("long").as("__rts") +:
      payloadCols.map(col): _*)
    val r2 = right
      .groupBy(col(keyCol).as("__k"), col(rightTs).cast("long").as("__rt"))
      .agg(max_by(rv, col(tieBreak)).as("__rv"))
      .select(col("__k"), (col("__rt") * dir).as("__ts"), lit(0).as("__side"),
        col("__rv"))
    val rvType = r2.schema("__rv").dataType
    val l2 = left.select(
      struct(left.columns.map(col): _*).as("__lrow"),
      col(keyCol).as("__k"), (col(leftTs).cast("long") * dir).as("__ts"),
      lit(1).as("__side"), lit(null).cast(rvType).as("__rv"))
    // floor on the DIRECTED axis in PURE INTEGER math. The r11 form,
    // floor(ts / b.toDouble), is safe only while |ts| < 2^53: beyond that
    // the quotient's rounding error reaches 1/b and a ts one unit below a
    // boundary can round UP into the wrong bucket — a wrong as-of match.
    // Epoch-ms sits inside the safe range, but epoch-µs/ns (or any other
    // long-typed axis a caller feeds in) does not; integer math removes
    // the cliff entirely. pmod is nonnegative, so (ts − pmod(ts,b)) is
    // the exact floor multiple and its truncating `div` equals floor
    // division for either sign (dir = -1 negates the axis).
    val u = r2.select(lit(null).cast(l2.schema("__lrow").dataType).as("__lrow"),
      col("__k"), col("__ts"), col("__side"), col("__rv"))
      .unionByName(l2)
      .withColumn("__b",
        expr(s"(__ts - pmod(__ts, ${bucketMs}L)) div ${bucketMs}L"))
    // pass 1: within-bucket at-or-before — partition (key, bucket), so a
    // hot key spreads over its buckets instead of one task
    val w1 = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = u.withColumn("__m1", last(col("__rv"), ignoreNulls = true).over(w1))
    // pass 2 input: ONE row per (key, bucket) with the bucket's latest
    // right payload (null for right-free buckets) — bounded by bucket
    // count, not row count
    val bl = u.groupBy(col("__k"), col("__b"))
      .agg(max_by(col("__rv"),
        when(col("__side") === 0, col("__ts"))).as("__last"))
    val w2 = Window.partitionBy(col("__k")).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = bl.withColumn("__carry",
      last(col("__last"), ignoreNulls = true).over(w2))
      .select(col("__k"), col("__b"), col("__carry"))
    val withMatch = local.filter(col("__side") === 1)
      .join(carry, Seq("__k", "__b"))
      .withColumn("__m", coalesce(col("__m1"), col("__carry")))
    // __ts is dir-scaled; the matched struct keeps the REAL right ts,
    // so the distance is __ts - dir*matched.ts in either direction
    val ok = when(
      col("__ts") - lit(dir) * col("__m").getField("__rts") <= toleranceMs,
      col("__m"))
    withMatch.select(
      col("__lrow.*") +:
        ok.getField("__rts").as("asof_ts") +:
        payloadCols.map(c => ok.getField(c).as("asof_" + c)): _*)
  }

  /** shared core; `dir` = +1 scans time forward (backward join), -1
    * scans time mirrored (forward join). Sort key is dir·ts; the match
    * distance dir·(left.ts − right.ts) is ≥ 0 by construction and the
    * tolerance gates its magnitude.
    */
  private def join0(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payloadCols: Seq[String],
      tieBreak: String, toleranceMs: Long, dir: Long): DataFrame = {
    // collapse right-side (key, ts) ties deterministically: greatest
    // tie-break column wins — one partial-aggregated groupBy, no window
    val rv = struct(col(rightTs).cast("long").as("__rts") +:
      payloadCols.map(col): _*)
    val r2 = right
      .groupBy(col(keyCol).as("__k"), col(rightTs).cast("long").as("__rt"))
      .agg(max_by(rv, col(tieBreak)).as("__rv"))
      .select(col("__k"), (col("__rt") * dir).as("__ts"),
        lit(0).as("__side"), col("__rv"))
    val rvType = r2.schema("__rv").dataType
    val l2 = left.select(
      struct(left.columns.map(col): _*).as("__lrow"),
      col(keyCol).as("__k"), (col(leftTs).cast("long") * dir).as("__ts"),
      lit(1).as("__side"), lit(null).cast(rvType).as("__rv"))
    val u = r2.select(lit(null).cast(l2.schema("__lrow").dataType).as("__lrow"),
      col("__k"), col("__ts"), col("__side"), col("__rv"))
      .unionByName(l2)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withMatch = u.withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    // tolerance gate: a too-distant match degrades to no-match (null
    // payload); __ts is already dir·left.ts, so the distance is
    // __ts − dir·matched.ts regardless of direction
    val ok = when(
      col("__ts") - lit(dir) * col("__m").getField("__rts") <= toleranceMs,
      col("__m"))
    withMatch.select(
      col("__lrow.*") +:
        ok.getField("__rts").as("asof_ts") +:
        payloadCols.map(c => ok.getField(c).as("asof_" + c)): _*)
  }
}
