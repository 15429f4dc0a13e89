package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.FingerprintIndex
import graft.logql._
import graft.promql.QueryParams

/** Segments-backed LogQL front door — the full reference query lifecycle
  * in one call (queryapi/logs_evaluator.go: segment lookup via the
  * fingerprint index, then per-segment evaluation): parse the LogQL
  * string, compute fingerprint requirements per leaf, prune the file
  * list through [[FingerprintIndex]], dateint-prune to the effective
  * time range (query window extended left by the largest range+offset
  * lookback), and evaluate the expression with the shared compiler.
  *
  * Pruning across binop expressions is per-leaf conservative: a file is
  * skipped only when EVERY leaf excludes it (a file needed by any leaf
  * must be read).
  */
object LogSegments {

  private def leafPipelines(e: LogExpr): Seq[LogPipeline] = e match {
    case LeafQuery(q) => q.raw.orElse(q.range.map(_.pipeline)).toSeq
    case LogBin(_, l, r) => leafPipelines(l) ++ leafPipelines(r)
    case _ => Nil
  }

  private def maxLookbackMs(e: LogExpr): Long = e match {
    case LeafQuery(q) => q.range.map(r => r.rangeMs + r.offsetMs).getOrElse(0L)
    case LogBin(_, l, r) => math.max(maxLookbackMs(l), maxLookbackMs(r))
    case _ => 0L
  }

  /** The pruned cooked-logs frame a LogQL expression will scan (exposed
    * for plan inspection/tests). All leaves share ONE index read — their
    * requirement trees are batched through
    * [[FingerprintIndex.excludedForTrees]], which intersects per-leaf
    * exclusions (a file needed by any leaf must be read).
    */
  def scanFor(spark: SparkSession, segDir: String, e: LogExpr,
      p: QueryParams, org: Option[String] = None): DataFrame = {
    val excluded = FingerprintIndex.excludedForTrees(spark, segDir,
      leafPipelines(e).map(FingerprintIndex.requirementTreeFor))
    val effStart = p.startMs - maxLookbackMs(e)
    val scan0 = FingerprintIndex.prunedRead(spark, segDir, excluded)
      .filter(col("dateint") >= StepPolicy.dateintOf(effStart) &&
        col("dateint") <= StepPolicy.dateintOf(p.endMs - 1))
    // tenant isolation: org leads the partition layout, so this equality
    // prunes every other tenant's directories before dateint pruning
    org.fold(scan0)(o => scan0.filter(col("org") === o).drop("org"))
      .drop("dateint") // partition key, not a log label
  }

  /** true when the expression is a plain RAW log query — the shape the
    * time-sliced streaming path serves (metric-style LogQL returns a
    * grid and stays one-shot; binops need both sides whole)
    */
  def sliceableRaw(logql: String): Boolean =
    Parser.parseFull(logql).fold(_ => false, {
      case LeafQuery(q) => q.raw.isDefined
      case _ => false
    })

  /** UTC-day-aligned slice plan for a raw log query: the span splits on
    * day boundaries (= the `dateint` partition key, so every slice scan
    * partition-prunes exactly) into at most `maxSlices` windows; spans
    * under `minSpanMs` stay one-shot. Returned oldest-first; the caller
    * reverses for descending streams.
    */
  def slicePlanRaw(p: QueryParams, maxSlices: Int = 8,
      minSpanMs: Long = 86400000L): Seq[QueryParams] = {
    val day = 86400000L
    if (p.endMs - p.startMs < minSpanMs) return Seq(p)
    val firstB = (p.startMs / day + 1) * day // first day boundary inside
    val bounds = Iterator.iterate(firstB)(_ + day).takeWhile(_ < p.endMs).toSeq
    val days = bounds.size + 1
    val n = math.min(maxSlices, days)
    if (n <= 1) return Seq(p)
    val perSlice = (days + n - 1) / n // days per slice
    val cuts = (1 until n).map(i => bounds(math.min(i * perSlice, days - 1) - 1))
      .distinct.filter(b => b > p.startMs && b < p.endMs)
    val edges = (p.startMs +: cuts) :+ p.endMs
    edges.sliding(2).map(w => QueryParams(w(0), w(1), p.stepMs)).toSeq
  }

  /** The slice evaluator for the streaming front door: one [[query]]
    * frame per slice with everything slice-invariant hoisted — the
    * parse, the fingerprint-index exclusion job, and the segment-dir
    * listing (one shared relation; per-slice dateint filters partition-
    * prune it). Slices arrive oldest-first from [[slicePlanRaw]]; pass
    * them newest-first for a descending stream. Each slice applies the
    * FULL limit (per-slice results are supersets of what the global
    * stream may still need; the SSE layer trims to the remaining budget
    * and stops launching slices once it is spent — the reference's
    * newest-first early-exit segment walk, logs_evaluator.go:233-424).
    */
  def querySliced(spark: SparkSession, segDir: String, logql: String,
      slices: Seq[QueryParams], limit: Int = 1000, desc: Boolean = true,
      fields: Seq[String] = Nil,
      org: Option[String] = None): Seq[() => DataFrame] = {
    val e = Parser.parseFull(logql)
      .fold(err => throw new IllegalArgumentException(err), identity)
    val excluded = FingerprintIndex.excludedForTrees(spark, segDir,
      leafPipelines(e).map(FingerprintIndex.requirementTreeFor))
    val base0 = FingerprintIndex.prunedRead(spark, segDir, excluded)
    val base = org.fold(base0)(o => base0.filter(col("org") === o).drop("org"))
    slices.map { sp => () =>
      val scan = base
        .filter(col("dateint") >= StepPolicy.dateintOf(sp.startMs) &&
          col("dateint") <= StepPolicy.dateintOf(sp.endMs - 1))
        .drop("dateint")
      Compiler.exprQuery(e, LogStore(scan), sp, limit, desc, fields)
    }
  }

  /** Full LogQL query over written log segments. */
  def query(spark: SparkSession, segDir: String, logql: String, p: QueryParams,
      limit: Int = 1000, desc: Boolean = true, fields: Seq[String] = Nil,
      org: Option[String] = None): DataFrame = {
    val e = Parser.parseFull(logql)
      .fold(err => throw new IllegalArgumentException(err), identity)
    Compiler.exprQuery(e, LogStore(scanFor(spark, segDir, e, p, org)), p,
      limit, desc, fields)
  }

  /** Logs-side dashboard fusion (mirror of
    * [[graft.promql.Engine.queryMultiTagged]]): N METRIC-style LogQL
    * panels — volume by level, error rate, unwrap aggregations — over
    * different streams and groupings share ONE materialized pass over
    * the pruned log scan: the index exclusion intersects across every
    * panel's pipelines (one index read), the dateint window extends by
    * the max lookback across panels, the row-level time filter pushes to
    * the scan, and each panel's compiler pass reads the materialized
    * blocks. K panels = 1 lake scan + K block-local passes; repeated
    * panels (same LogQL under two aliases) evaluate once. Output is the
    * tagged union (alias, ts, series-JSON, value). RAW log queries are
    * rejected — they return rows, not grids, and stream through the
    * single-query sliced path.
    */
  def queryMultiTagged(spark: SparkSession, segDir: String,
      exprs: Seq[(String, String)], p: QueryParams,
      org: Option[String] = None): DataFrame =
    taggedOver(exprs, multiShared(spark, segDir, exprs, p, org), p)

  /** true when the LogQL string is a plain RAW log query (rows, not a
    * grid) — the shape the multi doors reject and the HTTP mixed-panel
    * route serves through the single-query path instead. Parse failure
    * => false: a malformed expression takes the metric multi path and
    * 400s at its parse, one obvious place.
    */
  def isRaw(logql: String): Boolean =
    Parser.parseFull(logql).fold(_ => false, {
      case LeafQuery(q) => q.raw.isDefined
      case _ => false
    })

  /** The ONE scan-prep for both multi doors (one-shot + sliced): parse,
    * reject raw panels, batch every panel's index requirements through
    * one index read, dateint/org/time-prune over the FULL window, and
    * materialize the shared pass. Extracted so a pruning fix lands on
    * both doors at once — they previously duplicated these ~25 lines
    * verbatim, a drift hazard (r15 ADVICE).
    */
  private def multiShared(spark: SparkSession, segDir: String,
      exprs: Seq[(String, String)], full: QueryParams,
      org: Option[String]): LogStore = {
    require(exprs.nonEmpty, "multi-panel door needs at least one expression")
    val parsed = exprs.map { case (a, q) =>
      (a, q, Parser.parseFull(q)
        .fold(err => throw new IllegalArgumentException(err), identity))
    }
    parsed.find(t => t._3 match {
      case LeafQuery(q) => q.raw.isDefined
      case _ => false
    }).foreach { t =>
      throw new IllegalArgumentException(
        s"the multi-panel door serves metric-style LogQL panels; raw log " +
          s"query '${t._2}' streams through the single-query path")
    }
    val excluded = FingerprintIndex.excludedForTrees(spark, segDir,
      parsed.flatMap(t => leafPipelines(t._3))
        .map(FingerprintIndex.requirementTreeFor))
    val effStart = full.startMs - parsed.map(t => maxLookbackMs(t._3)).max
    val scan0 = FingerprintIndex.prunedRead(spark, segDir, excluded)
      .filter(col("dateint") >= StepPolicy.dateintOf(effStart) &&
        col("dateint") <= StepPolicy.dateintOf(full.endMs - 1))
    val scan = org.fold(scan0)(o => scan0.filter(col("org") === o).drop("org"))
      .drop("dateint")
      .filter(col("chq_timestamp") >= effStart &&
        col("chq_timestamp") < full.endMs)
    LogStore(graft.GraftSession.materialize(scan))
  }

  /** the tagged-union inner loop over a caller-prepared store — shared by
    * the one-shot door above and the sliced door below (ONE materialized
    * pass per request, evaluated per slice); distinct queries evaluate
    * once, alias lists explode over their rows
    */
  private def taggedOver(exprs: Seq[(String, String)], store: LogStore,
      p: QueryParams): DataFrame =
    exprs.map(_._2).distinct.map { q =>
      val aliases = exprs.filter(_._2 == q).map(_._1)
      val out = Compiler.query(q, store, p)
      val labels = out.columns.filterNot(c => c == "ts" || c == "value").sorted
      out.select(explode(lit(aliases.toArray)).as("alias"), col("ts"),
        to_json(struct(labels.map(col): _*)).as("series"), col("value"))
    }.reduce(_.union(_))

  /** [[queryMultiTagged]], SLICED (the logs twin of
    * [[MetricSegments.queryMultiAtSliced]]): one shared materialized
    * pass over the full window's pruned scan feeds every
    * (slice × panel) evaluation — a 30-day logs dashboard costs one
    * lake scan total and streams its first slice after that scan plus
    * one slice-sized compiler pass. Metric-style LogQL slices exactly
    * (every grid bucket depends only on [t − lookback, t]; LogQL has no
    * @-pin to exclude); raw panels are rejected as in the one-shot door.
    */
  def queryMultiTaggedSliced(spark: SparkSession, segDir: String,
      exprs: Seq[(String, String)], full: QueryParams,
      slices: Seq[QueryParams],
      org: Option[String] = None): Seq[() => DataFrame] = {
    val shared = multiShared(spark, segDir, exprs, full, org)
    slices.map { sp => () => taggedOver(exprs, shared, sp) }
  }
}
