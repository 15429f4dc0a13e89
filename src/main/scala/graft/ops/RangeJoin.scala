package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — match events to the time intervals
  * that contain them on a shared key (span containment, deploy-window
  * attribution, maintenance-window suppression). The naive formulation
  * `p.ts BETWEEN i.start AND i.end` as a join condition gives Spark no
  * equi-key and degenerates to a per-key nested loop — quadratic long
  * before 100 TB.
  *
  * Spark-first shape: BUCKETIZE. Each interval explodes to the fixed-
  * width time buckets it overlaps, each point maps to its one bucket,
  * and the join becomes a plain equi-join on (key, bucket) followed by
  * an exact containment filter. Expansion per interval is
  * `len/bucketMs + 1` rows — bounded and chosen by the caller (pick
  * bucketMs near the typical interval length; Catalyst then runs a
  * standard shuffled hash/sort-merge join that scales linearly). This
  * is the classic interval-bucketing trick public engines use for
  * range-join acceleration.
  */
object RangeJoin {

  /** half-open containment: start <= ts < end, per key. Returns one row
    * per (point, containing interval): all point columns + the interval
    * payload as `iv_<name>` + `iv_start`/`iv_end`.
    *
    * @param bucketMs bucket width; per-interval fanout = len/bucketMs+1
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keyCol: String, tsCol: String, startCol: String, endCol: String,
      payloadCols: Seq[String], bucketMs: Long): DataFrame = {
    val iv = intervals.select(col(keyCol).as("__k"),
      col(startCol).cast("long").as("__s"),
      col(endCol).cast("long").as("__e"),
      struct(payloadCols.map(col): _*).as("__iv"))
      .filter(col("__e") > col("__s"))
    // inclusive bucket span [floor(s/b), floor((e-1)/b)] in pure integer
    // math — double division + long-cast truncation is floor only for
    // nonnegative ts, and its rounding crosses bucket boundaries once
    // |ts| approaches 2^53 (same fix as AsofJoin.bucketed0)
    def fdiv(c: String): Column =
      expr(s"($c - pmod($c, ${bucketMs}L)) div ${bucketMs}L")
    val ivb = iv
      .withColumn("__e1", col("__e") - 1)
      .withColumn("__b", explode(sequence(fdiv("__s"), fdiv("__e1"))))
      .drop("__e1")
    val pb = points
      .withColumn("__pk", col(keyCol))
      .withColumn("__pts", col(tsCol).cast("long"))
      .withColumn("__b", fdiv("__pts"))
    pb.join(ivb, pb("__pk") === ivb("__k") && pb("__b") === ivb("__b"))
      .filter(col("__pts") >= col("__s") && col("__pts") < col("__e"))
      .select(points.columns.map(pb(_)) ++
        (col("__s").as("iv_start") +: col("__e").as("iv_end") +:
          payloadCols.map(c => col("__iv").getField(c).as("iv_" + c))): _*)
  }
}
