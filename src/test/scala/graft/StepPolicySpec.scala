package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.StepPolicy

class StepPolicySpec extends AnyFunSuite {

  test("span → step table matches the reference policy") {
    assert(StepPolicy.stepMsFor(30L * 60000L) == 10000L)      // 30 min
    assert(StepPolicy.stepMsFor(65L * 60000L) == 10000L)      // boundary
    assert(StepPolicy.stepMsFor(2L * 3600000L) == 60000L)     // 2 h
    assert(StepPolicy.stepMsFor(12L * 3600000L) == 60000L)    // boundary
    assert(StepPolicy.stepMsFor(18L * 3600000L) == 300000L)   // 18 h
    assert(StepPolicy.stepMsFor(2L * 86400000L) == 1200000L)  // 2 d
    assert(StepPolicy.stepMsFor(30L * 86400000L) == 3600000L) // 30 d
  }

  test("tier selection: largest tier dividing the step") {
    assert(StepPolicy.tierFor(10000L) == 10000L)
    assert(StepPolicy.tierFor(60000L) == 60000L)
    assert(StepPolicy.tierFor(300000L) == 300000L)
    assert(StepPolicy.tierFor(1200000L) == 1200000L)
    assert(StepPolicy.tierFor(3600000L) == 3600000L)
    assert(StepPolicy.tierFor(120000L) == 60000L)  // 2 m step → 1 m tier
    assert(StepPolicy.tierFor(90000L) == 10000L)   // 90 s → 10 s divides
  }

  test("paramsFor aligns start to step") {
    val p = StepPolicy.paramsFor(1704067212345L, 1704067212345L + 86400000L)
    assert(p.stepMs == 300000L && p.startMs % p.stepMs == 0)
  }

  test("MetricSegments front door: span→step→tier→engine equals the manual path") {
    import org.apache.spark.sql.functions._
    import graft.api.{MetricSegments, StepPolicy}
    val spark = TestSpark.spark
    val ev = graft.model.Tables.events(spark, TestSpark.sf)
    val base = graft.ingest.MetricsPreAgg.preAggregate(ev, col("ts_ms"), lit("m"),
      col("value"), Seq("attr_event_type" -> col("event_type")),
      freqMs = 10000L, withSketch = false)
    val dir = java.nio.file.Files.createTempDirectory("graft_msegq_").toString
    graft.ingest.Segments.writeMetricSegments(base, dir)
    graft.ingest.Segments.writeMetricSegments(
      graft.ingest.MetricsPreAgg.rollup(base, 3600000L), dir)
    val start = 1704067200000L
    val end = start + 14L * 86400000L
    val q = "sum by (attr_event_type) (rate(m[4h]))"
    // lookback extraction sees through agg + range fn
    val ast = graft.promql.Parser.parse(q).toOption.get
    assert(MetricSegments.maxLookbackMs(ast) == 4L * 3600000L)
    // NaN rows (uncovered windows) dropped: NaN != NaN would break set equality
    val got = MetricSegments.query(spark, dir, q, start, end)
      .filter(!isnan(col("value")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val p = StepPolicy.paramsFor(start, end)
    val manual = graft.promql.Engine.query(q,
      MetricSegments.storeFrom(
        StepPolicy.scanTier(spark, dir, p.stepMs, p.startMs - 4L * 3600000L, p.endMs)), p)
      .filter(!isnan(col("value")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got.nonEmpty && got == manual)
  }

  test("lookback/selector walkers are TOTAL over the AST (nodes the old " +
      "enumeration missed)") {
    import graft.api.MetricSegments
    def ast(q: String) = graft.promql.Parser.parse(q)
      .fold(e => fail(s"parse: $e"), identity)
    val H = 3600000L
    // each of these returned lookback 0 / no selectors before the
    // Product-reflection walker — under-pruning queryAt's dateint window
    // whenever the lookback crossed a day boundary
    assert(MetricSegments.maxLookbackMs(ast("predict_linear(m[4h], 600)")) == 4 * H)
    assert(MetricSegments.maxLookbackMs(
      ast("double_exponential_smoothing(m[2h], 0.5, 0.5)")) == 2 * H)
    assert(MetricSegments.maxLookbackMs(ast("absent_over_time(m[6h])")) == 6 * H)
    assert(MetricSegments.maxLookbackMs(
      ast("""count_values("v", m offset 1h)""")) == H)
    assert(MetricSegments.maxLookbackMs(ast("timestamp(m offset 30m)")) == H / 2)
    assert(MetricSegments.maxLookbackMs(ast("sort(rate(m[1h]))")) == H)
    // subquery window extends everything inside it (pre-existing rule,
    // preserved by the total walker)
    assert(MetricSegments.maxLookbackMs(
      ast("max_over_time(rate(m[30m])[1h:10m])")) == H + H / 2)
    assert(MetricSegments.selectors(ast("predict_linear(m[4h], 600)")).size == 1)
    assert(MetricSegments.selectors(
      ast("""count_values("v", m{a="b"})""")).head.matchers.nonEmpty)
    // an @-pinned selector under a previously-unlisted node must disable
    // slicing (its pin reads outside any slice's pruned scan)
    assert(!MetricSegments.sliceable("sort(m @ 1704067200)"))
    assert(!MetricSegments.sliceable("predict_linear(m[4h] @ end(), 600)"))
    assert(MetricSegments.sliceable("predict_linear(m[4h], 600)"))
  }

  test("metric-name fingerprint pruning skips files of other metrics") {
    import org.apache.spark.sql.functions._
    import graft.api.MetricSegments
    import graft.ingest.{FingerprintIndex => FI}
    val spark = TestSpark.spark
    val ev = graft.model.Tables.events(spark, TestSpark.sf)
    def cook(name: String) = graft.ingest.MetricsPreAgg.preAggregate(ev,
      col("ts_ms"), lit(name), col("value"),
      Seq("attr_event_type" -> col("event_type")), freqMs = 60000L,
      withSketch = false)
    val dir = java.nio.file.Files.createTempDirectory("graft_midx_").toString
    // sorted by metric_name within partitions + small file splits → the two
    // metrics land in disjoint files, exactly what the index can exploit;
    // hourly rollup tier included so the 14 d span has its tier to read
    // ~100 rows/day/tier at the test SF → 30/file forces metric-contiguous
    // splits (the sort order leads with metric_name)
    val both = cook("m_alpha").unionByName(cook("m_beta"))
    graft.ingest.Segments.writeMetricSegments(both, dir, maxRecordsPerFile = 30)
    graft.ingest.Segments.writeMetricSegments(
      graft.ingest.MetricsPreAgg.rollup(both, 3600000L), dir, maxRecordsPerFile = 10)
    FI.buildLogIndex(spark, dir)
    val start = 1704067200000L
    val end = start + 14L * 86400000L
    val q = "sum by (attr_event_type) (rate(m_alpha[4h]))"
    val got = MetricSegments.query(spark, dir, q, start, end)
    val all = spark.read.parquet(dir).inputFiles.length
    val p = graft.api.StepPolicy.paramsFor(start, end)
    val prunedFiles = FI.prunedRead(spark, dir,
      FI.excludedFiles(spark, dir, Seq(FI.Requirement("metric_name",
        Seq(FI.existsFp("metric_name"), FI.fingerprint("metric_name", "m_alpha")),
        guarded = false)))).inputFiles.length
    assert(prunedFiles < all, s"no metric-name pruning: $prunedFiles/$all")
    // results equal the unpruned manual path
    val manual = graft.promql.Engine.query(q,
      MetricSegments.storeFrom(graft.api.StepPolicy.scanTier(spark, dir,
        p.stepMs, p.startMs - 4L * 3600000L, p.endMs)), p)
      .filter(!isnan(col("value")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val gotSet = got.filter(!isnan(col("value")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(gotSet.nonEmpty && gotSet == manual)
  }

  test("a multi-selector PromQL expression costs exactly ONE index read") {
    import org.apache.spark.sql.functions._
    import graft.api.MetricSegments
    import graft.ingest.{FingerprintIndex => FI}
    val spark = TestSpark.spark
    val ev = graft.model.Tables.events(spark, TestSpark.sf)
    def cook(name: String) = graft.ingest.MetricsPreAgg.preAggregate(ev,
      col("ts_ms"), lit(name), col("value"),
      Seq("attr_event_type" -> col("event_type")), freqMs = 10000L,
      withSketch = false)
    val dir = java.nio.file.Files.createTempDirectory("graft_1read_").toString
    val both = cook("m_a").unionByName(cook("m_b"))
    graft.ingest.Segments.writeMetricSegments(both, dir, maxRecordsPerFile = 50)
    FI.buildLogIndex(spark, dir)
    val start = 1704067200000L
    val before = FI.indexReads.get()
    val got = MetricSegments.query(spark, dir,
      "sum(m_a) / sum(m_b)", start, start + 3600000L)
    got.collect()
    assert(FI.indexReads.get() - before == 1,
      s"expected 1 index read for a 2-selector expression, got ${FI.indexReads.get() - before}")
  }

  test("bare matcher sets (empty metric name) never prune metric files") {
    import org.apache.spark.sql.functions._
    import graft.api.MetricSegments
    val spark = TestSpark.spark
    val ev = graft.model.Tables.events(spark, TestSpark.sf)
    // 10s tier: a 1h query span selects step=10s → tier=10000
    val base = graft.ingest.MetricsPreAgg.preAggregate(ev, col("ts_ms"),
      lit("m_only"), col("value"),
      Seq("attr_event_type" -> col("event_type")), freqMs = 10000L,
      withSketch = false)
    val dir = java.nio.file.Files.createTempDirectory("graft_bare_").toString
    graft.ingest.Segments.writeMetricSegments(base, dir, maxRecordsPerFile = 50)
    graft.ingest.FingerprintIndex.buildLogIndex(spark, dir)
    val start = 1704067200000L
    // `{attr_event_type="purchase"}` selects across ALL metrics — with an
    // index present this must still read every file, not exclude them all
    val got = MetricSegments.query(spark, dir,
      """sum by (attr_event_type) ({attr_event_type="purchase"})""",
      start, start + 3600000L)
    assert(got.filter(!isnan(col("value"))).count() > 0,
      "bare matcher set returned nothing against an indexed segment dir")
  }

  test("scanTier prunes to the freq partition of a segment dir") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val ev = graft.model.Tables.events(spark, TestSpark.sf)
    val base = graft.ingest.MetricsPreAgg.preAggregate(ev, col("ts_ms"), lit("m"),
      col("value"), Seq("attr_event_type" -> col("event_type")),
      freqMs = 60000L, withSketch = false)
    val hourly = graft.ingest.MetricsPreAgg.rollup(base, 3600000L)
    val dir = java.nio.file.Files.createTempDirectory("graft_tiers_").toString
    graft.ingest.Segments.writeMetricSegments(base, dir)
    graft.ingest.Segments.writeMetricSegments(hourly, dir)
    val scan = StepPolicy.scanTier(spark, dir, stepMs = 3600000L)
    assert(scan.count() == hourly.count())
    // partition pruning: only the freq=3600000 directory is read
    scan.collect()
    val plan = scan.queryExecution.executedPlan.toString()
    assert(plan.contains("freq") && scan.select("freq").distinct().count() == 1)
  }

  test("slicePlan: step-aligned, contiguous, covers the grid exactly") {
    import graft.api.MetricSegments.slicePlan
    import graft.promql.QueryParams
    // 30 days at 1h step = 720 steps -> 8 slices of 90 steps
    val p = StepPolicy.paramsFor(1700000000123L, 1700000000123L + 30L * 86400000L)
    assert(p.stepMs == 3600000L)
    val slices = slicePlan(p)
    assert(slices.size == 8)
    // contiguous ascending cover of [aligned start, end), boundaries on
    // step multiples so every slice grid is a sub-grid of the full grid
    val a0 = p.startMs - p.startMs % p.stepMs
    assert(slices.head.startMs == a0 && slices.last.endMs == p.endMs)
    slices.sliding(2).foreach { case Seq(x, y) =>
      assert(x.endMs == y.startMs)
      assert((x.startMs - a0) % p.stepMs == 0)
    }
    assert(slices.forall(_.stepMs == p.stepMs))
    // interactive spans pass through unsliced (sub-24h = one-shot path)
    val short = StepPolicy.paramsFor(1700000000123L, 1700000000123L + 3600000L)
    assert(slicePlan(short) == Seq(short))
    val halfDay = StepPolicy.paramsFor(1700000000123L,
      1700000000123L + 12L * 3600000L)
    assert(slicePlan(halfDay) == Seq(halfDay))
    // a span just over the min-slice width still never under-fills:
    // 31 steps with minStepsPerSlice 30 -> one 30-step + one 1-step slice
    val p31 = QueryParams(0L, 31L * 60000L, 60000L)
    val s31 = slicePlan(p31, maxSlices = 8, minStepsPerSlice = 30, minSpanMs = 0L)
    assert(s31.map(s => (s.endMs - s.startMs) / 60000L) == Seq(30L, 1L))
  }
}
