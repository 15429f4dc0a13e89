package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.promql._

class PromQLParserSpec extends AnyFunSuite {
  private def p(s: String): Expr =
    Parser.parse(s).fold(e => fail(s"parse '$s': $e"), identity)

  test("selector with matchers, range, offset") {
    val e = p("""http_requests{job="api", code=~"5..", env!="dev"}[5m] offset 1h""")
    val s = e.asInstanceOf[Selector]
    assert(s.metric == "http_requests")
    assert(s.matchers.map(_.op) == List(MatchOp.Eq, MatchOp.Re, MatchOp.Ne))
    assert(s.rangeMs == 300000L && s.offsetMs == 3600000L)
  }

  test("subquery step") {
    val s = p("m[1h:5m]").asInstanceOf[Selector]
    assert(s.rangeMs == 3600000L && s.subStepMs == 300000L)
  }

  test("aggregation prefix and suffix grouping") {
    val a = p("sum by (job) (rate(m[5m]))").asInstanceOf[Agg]
    assert(a.op == "sum" && a.by == List("job"))
    val b = p("sum(rate(m[5m])) without (instance)").asInstanceOf[Agg]
    assert(b.without == List("instance"))
  }

  test("topk with param") {
    val a = p("topk(3, m)").asInstanceOf[Agg]
    assert(a.op == "topk" && a.param.contains(3.0))
  }

  test("binary precedence: mul binds tighter than add, comparison loosest") {
    val e = p("a + b * c > 2").asInstanceOf[BinOp]
    assert(e.op == ">")
    val add = e.lhs.asInstanceOf[BinOp]
    assert(add.op == "+" && add.rhs.asInstanceOf[BinOp].op == "*")
  }

  test("set ops and bool modifier") {
    val e = p("a and b or c").asInstanceOf[BinOp]
    assert(e.op == "or")
    val c = p("a > bool 0").asInstanceOf[BinOp]
    assert(c.boolMod)
  }

  test("Inf and NaN literals parse in number and expression positions") {
    assert(p("clamp(m, -Inf, 3)") == ClampRange(Selector("m", Nil),
      Double.NegativeInfinity, 3.0))
    assert(p("clamp_min(m, inf)") == Clamp(true, Selector("m", Nil),
      Double.PositiveInfinity))
    p("m > Inf") match {
      case BinOp(">", _, NumberLit(v), _, _) => assert(v.isPosInfinity)
      case other => fail(other.toString)
    }
    p("NaN") match {
      case NumberLit(v) => assert(v.isNaN)
      case other => fail(other.toString)
    }
    // an identifier merely STARTING with inf is still a selector
    assert(p("influx_rows") == Selector("influx_rows", Nil))
  }

  test("atan2 binds at the mul/div tier and accepts matching modifiers") {
    p("a + b atan2 c") match {
      case BinOp("+", _, BinOp("atan2", _, _, _, _), _, _) => ()
      case other => fail(other.toString)
    }
    p("a atan2 on(k) b") match {
      case BinOp("atan2", _, _, Some(m), _) => assert(m.on && m.labels == List("k"))
      case other => fail(other.toString)
    }
  }

  test("on/ignoring accepted; group modifiers parse with card and include") {
    val e = p("a / on(job) b").asInstanceOf[BinOp]
    assert(e.matching.contains(VectorMatch(on = true, List("job"))))
    val gl = p("a / on(job) group_left b").asInstanceOf[BinOp]
    assert(gl.matching.contains(VectorMatch(on = true, List("job"), card = 1)))
    val gr = p("a / ignoring(x) group_right(info, env) b").asInstanceOf[BinOp]
    assert(gr.matching.contains(
      VectorMatch(on = false, List("x"), card = 2, include = List("info", "env"))))
    // group modifiers require an explicit on/ignoring
    assert(Parser.parse("a / group_left b").isLeft)
    // @ modifier forms
    assert(p("m @ 1704067200") ==
      Selector("m", Nil, atKind = 1, atMs = 1704067200000L))
    assert(p("m offset 1h @ start()") ==
      Selector("m", Nil, offsetMs = 3600000L, atKind = 2))
    assert(p("m @ end() offset 1h") ==
      Selector("m", Nil, offsetMs = 3600000L, atKind = 3))
  }

  test("negative offset parses SIGNED (look-ahead), selector and subquery") {
    // pre-r16 the unsigned duration regex silently skipped the '-', so
    // `offset -5m` evaluated as `offset 5m` — the sign must survive
    assert(p("m offset -5m") == Selector("m", Nil, offsetMs = -300000L))
    assert(p("m[10m] offset -1h") ==
      Selector("m", Nil, rangeMs = 600000L, offsetMs = -3600000L))
    assert(p("(m)[1h:5m] offset -30m") ==
      Subquery(Selector("m", Nil), 3600000L, 300000L, -1800000L))
    // combined with @: both modifiers keep their meaning
    assert(p("m offset -1h @ 1704067200") ==
      Selector("m", Nil, offsetMs = -3600000L, atKind = 1, atMs = 1704067200000L))
    // offset of zero stays invalid either way
    assert(Parser.parse("m offset -0s").isLeft)
  }

  test("forwardMs / pinWindowsMs walkers price look-ahead and literal pins") {
    val neg = p("sum(rate(m[5m] offset -1h))")
    assert(Ast.forwardMs(neg) == 3600000L)
    assert(Ast.lookbackMs(neg) == 300000L) // negative offset adds no LEFT reach
    assert(Ast.forwardMs(p("m offset 1h")) == 0L)
    // nested negative subquery offsets compound
    assert(Ast.forwardMs(p("(m offset -30m)[1h:5m] offset -1h")) == 5400000L)
    // literal pin window = [atMs - range - max(0,off), atMs - min(0,off)]
    assert(Ast.pinWindowsMs(p("m[10m] @ 1700000000")) ==
      Seq((1700000000000L - 600000L, 1700000000000L)))
    assert(Ast.pinWindowsMs(p("m offset -1h @ 1700000000")) ==
      Seq((1700000000000L, 1700000000000L + 3600000L)))
    // start()/end() pins resolve inside the query bounds: no extra window
    assert(Ast.pinWindowsMs(p("m @ start()")) == Nil)
    assert(Ast.pinWindowsMs(p("m offset 1h")) == Nil)
  }

  test("functions") {
    assert(p("clamp_min(m, 3)") == Clamp(true, Selector("m", Nil), 3.0))
    assert(p("abs(m)") == UnaryFn("abs", Selector("m", Nil)))
    assert(p("scalar(m)") == ScalarFn(Selector("m", Nil)))
    assert(p("histogram_quantile(0.9, m)").isInstanceOf[HistogramQuantile])
    assert(p("-m").isInstanceOf[BinOp])
  }

  test("gauge-analysis family parses") {
    assert(p("deriv(m[5m])") == RangeFn("deriv", Selector("m", Nil, 300000L)))
    assert(p("changes(m[5m])") == RangeFn("changes", Selector("m", Nil, 300000L)))
    assert(p("resets(m[5m])") == RangeFn("resets", Selector("m", Nil, 300000L)))
    assert(p("idelta(m[5m])") == RangeFn("idelta", Selector("m", Nil, 300000L)))
    assert(p("stddev_over_time(m[5m])").isInstanceOf[RangeFn])
    assert(p("present_over_time(m[5m])").isInstanceOf[RangeFn])
    assert(p("predict_linear(m[5m], 600)") ==
      PredictLinear(Selector("m", Nil, 300000L), 600.0))
    assert(Parser.parse("predict_linear(m, 600)").isLeft)
    assert(p("timestamp(m)") == TimestampFn(Selector("m", Nil)))
    assert(p("sort_desc(m)") == SortFn(true, Selector("m", Nil)))
    assert(p("hour(m)") == TimeComponentFn("hour", Selector("m", Nil)))
    assert(p("hour()") == TimeComponentFn("hour", TimeFn))
    assert(p("absent_over_time(m[5m])") ==
      AbsentOverTime(Selector("m", Nil, 300000L)))
    assert(Parser.parse("absent_over_time(m)").isLeft)
    assert(p("stddev by (a) (m)") == Agg("stddev", Selector("m", Nil), List("a")))
    assert(p("group(m)") == Agg("group", Selector("m", Nil)))
  }

  test("experimental functions parse: limitk, limit_ratio, sort_by_label, mad") {
    assert(p("limitk(5, m)") == Agg("limitk", Selector("m", Nil), param = Some(5.0)))
    assert(p("limit_ratio(0.1, m) by (job)") ==
      Agg("limit_ratio", Selector("m", Nil), by = List("job"), param = Some(0.1)))
    assert(p("mad_over_time(m[5m])") ==
      RangeFn("mad_over_time", Selector("m", Nil, 300000L)))
    // instant-form rejection is engine-level, like the other gauge fns
    assert(p("""sort_by_label(m, "a", "b")""") ==
      SortByLabel(false, Selector("m", Nil), List("a", "b")))
    assert(p("""sort_by_label_desc(m, "a")""") ==
      SortByLabel(true, Selector("m", Nil), List("a")))
    assert(Parser.parse("sort_by_label(m)").isLeft) // needs ≥1 label
  }

  test("label manipulation / absent / round parse") {
    assert(p("""label_replace(m, "d", "$1", "s", "(.*)")""") ==
      LabelReplace(Selector("m", Nil), "d", "$1", "s", "(.*)"))
    assert(p("""label_join(m, "d", "-", "a", "b")""") ==
      LabelJoin(Selector("m", Nil), "d", "-", List("a", "b")))
    assert(p("""absent(m{x="y"})""").isInstanceOf[Absent])
    assert(p("round(m)") == RoundFn(Selector("m", Nil), 1.0))
    assert(p("round(m, 0.5)") == RoundFn(Selector("m", Nil), 0.5))
  }
}

class PromQLEngineSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  private lazy val store = MetricStore(graft.model.Cooked.metrics(spark, sf))
  // sf0.001 events span 2024-01-01..30 but sparse; use wide step for coverage
  private val start = 1704067200000L
  private val p = QueryParams(start, start + 7L * 86400000L, 21600000L) // 6h step

  test("bare selector emits per-bucket sums with labels") {
    val df = Engine.query("events_value", store, p)
    assert(df.columns.toSeq == Seq("ts", "attr_event_type", "value"))
    assert(df.count() > 0)
    // all buckets step-aligned and in range
    val bad = df.filter(col("ts") % p.stepMs =!= 0 ||
      col("ts") < p.startMs || col("ts") >= p.endMs).count()
    assert(bad == 0)
  }

  test("queryMulti equals the per-agg query() answers on one shared scan") {
    val multi = Engine.queryMulti(Seq(
      "sum_v" -> "sum(events_value)", "avg_v" -> "avg(events_value)",
      "cnt_v" -> "count(events_value)"), store, p)
    assert(multi.columns.toSeq == Seq("ts", "sum_v", "avg_v", "cnt_v"))
    val fused = multi.collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    def one(q: String) = Engine.query(q, store, p).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (su, av) = (one("sum(events_value)"), one("avg(events_value)"))
    assert(fused.keySet == su.keySet)
    fused.foreach { case (ts, (s2, a2, c2)) =>
      assert(s2 == su(ts) && a2 == av(ts) && c2 > 0, s"ts=$ts")
    }
    // by-grouping rides the same path
    val byType = Engine.queryMulti(Seq(
      "mx" -> "max by (attr_event_type) (events_value)",
      "mn" -> "min by (attr_event_type) (events_value)"), store, p)
    assert(byType.columns.toSeq == Seq("ts", "attr_event_type", "mx", "mn"))
    assert(byType.filter(col("mx") < col("mn")).count() == 0 && byType.count() > 0)
    // contract violations throw at plan time, not at execution
    intercept[IllegalArgumentException] {
      Engine.queryMulti(Seq("a" -> "sum(events_value)",
        "b" -> "avg(other_metric)"), store, p)
    }
    intercept[IllegalArgumentException] {
      Engine.queryMulti(Seq("a" -> "topk(2, events_value)"), store, p)
    }
  }

  test("negative offset is look-ahead: bucket t carries the samples of t + |off|") {
    // off = exactly one step, so the negative-offset frame at ts t must
    // equal the plain selector evaluated over the forward-shifted window
    // at ts t + step — same store, both unpruned
    val step = p.stepMs
    val neg = Engine.query("events_value offset -6h", store, p).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val p2 = QueryParams(p.startMs + step, p.endMs + step, step)
    val plain = Engine.query("events_value", store, p2).collect()
      .map(r => (r.getLong(0) - step, r.getString(1)) -> r.getDouble(2)).toMap
    assert(neg.nonEmpty && neg == plain)
  }

  test("NotFusableException is the shape signal; genuine errors stay plain IAE") {
    // non-fusable shapes raise the TYPED signal (it subclasses
    // IllegalArgumentException, so pre-r16 callers keep working)...
    val nf = intercept[Engine.NotFusableException] {
      Engine.queryMulti(Seq("a" -> "sum(events_value)",
        "b" -> "avg(events_value{attr_event_type=\"error\"})"), store, p)
    }
    assert(nf.isInstanceOf[IllegalArgumentException])
    intercept[Engine.NotFusableException] {
      Engine.queryMulti(Seq("a" -> "topk(2, events_value)"), store, p)
    }
    intercept[Engine.NotFusableException] {
      Engine.queryMulti(Seq("a" -> "rate(events_value[4h])",
        "b" -> "rate(events_value[2h])"), store, p)
    }
    // ...while a PARSE failure — a genuinely bad panel — is a plain IAE,
    // NOT a fusability signal, so front doors no longer silently retry
    // it through the tagged door (r15 VERDICT #3)
    val pe = intercept[IllegalArgumentException] {
      Engine.queryMulti(Seq("a" -> "sum(events_value)", "b" -> "sum((("),
        store, p)
    }
    assert(!pe.isInstanceOf[Engine.NotFusableException])
  }

  test("queryMulti window fusion equals the per-fn query() answers bit-for-bit") {
    val multi = Engine.queryMulti(Seq(
      "rate_v" -> "rate(events_value[4h])",
      "inc_v" -> "increase(events_value[4h])",
      "avg_v" -> "avg_over_time(events_value[4h])",
      "last_v" -> "last_over_time(events_value[4h])"), store, p)
    assert(multi.columns.toSeq ==
      Seq("ts", "attr_event_type", "rate_v", "inc_v", "avg_v", "last_v"))
    def one(q: String): Map[(Long, String), Double] =
      Engine.query(q, store, p).collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val (ra, in, av, la) = (one("rate(events_value[4h])"),
      one("increase(events_value[4h])"),
      one("avg_over_time(events_value[4h])"),
      one("last_over_time(events_value[4h])"))
    val fused = multi.collect().map(r => (r.getLong(0), r.getString(1)) ->
      ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(fused.keySet == ra.keySet && fused.nonEmpty)
    def eq(a: Double, b: Double) = (a.isNaN && b.isNaN) ||
      java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)
    fused.foreach { case (k, (r2, i2, a2, l2)) =>
      assert(eq(r2, ra(k)) && eq(i2, in(k)) && eq(a2, av(k)) && eq(l2, la(k)),
        s"series $k diverged from the standalone answers")
    }
    // contract: mixed ranges / mixed selectors / unfusable fns throw at plan time
    intercept[IllegalArgumentException] {
      Engine.queryMulti(Seq("a" -> "rate(events_value[4h])",
        "b" -> "increase(events_value[6h])"), store, p)
    }
    intercept[IllegalArgumentException] {
      Engine.queryMulti(Seq("a" -> "rate(events_value[4h])",
        "b" -> "irate(events_value[4h])"), store, p)
    }
    // mixing a plain agg with a window fn is two different shapes
    intercept[IllegalArgumentException] {
      Engine.queryMulti(Seq("a" -> "sum(events_value)",
        "b" -> "rate(events_value[4h])"), store, p)
    }
  }

  test("queryMultiTagged: heterogeneous panels equal standalone answers, scan-free downstream") {
    import org.apache.spark.sql.functions._
    def bits(d: Double) = java.lang.Double.doubleToLongBits(d)
    val ev = graft.model.Tables.events(spark, sf)
    def cook(name: String, v: org.apache.spark.sql.Column) = ev
      .withColumn("chq_timestamp", col("ts_ms") - col("ts_ms") % lit(60000L))
      .withColumn("attr_event_type", col("event_type"))
      .groupBy(col("chq_timestamp"), col("attr_event_type"))
      .agg(sum(v).as("chq_rollup_sum"),
        count(lit(1)).cast("double").as("chq_rollup_count"),
        min(v).as("chq_rollup_min"), max(v).as("chq_rollup_max"))
      .withColumn("metric_name", lit(name))
    val st2 = MetricStore(cook("events_value", col("value"))
      .unionByName(cook("events_count", lit(1.0))))
    // two metrics, two groupings — unfusable by the identical-selector
    // paths; the general door shares ONE materialized pruned pass
    val tagged = Engine.queryMultiTagged(Seq(
      "sum_v" -> "sum by (attr_event_type) (events_value)",
      "inc_c" -> "increase(events_count[4h])"), st2, p)
    assert(tagged.columns.toSeq == Seq("alias", "ts", "series", "value"))
    val got = tagged.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)) -> bits(r.getDouble(3)))
      .toMap
    def one(alias: String, q: String) =
      Engine.query(q, st2, p).collect().map { r =>
        (alias, r.getLong(0),
          s"""{"attr_event_type":"${r.getString(1)}"}""") -> bits(r.getDouble(2))
      }.toMap
    val want = one("sum_v", "sum by (attr_event_type) (events_value)") ++
      one("inc_c", "increase(events_count[4h])")
    assert(got.nonEmpty && got == want)
    // downstream of the shared materialization: no file scan per panel
    assert(!tagged.queryExecution.executedPlan.toString.contains("FileScan"))

    // duplicate panels (same promql, different alias — a dashboard's
    // repeated query under two vizzes) evaluate ONCE: alias rows equal,
    // and the plan carries a single Window pass, not two
    val dup = Engine.queryMultiTagged(Seq(
      "x" -> "increase(events_count[4h])",
      "y" -> "increase(events_count[4h])"), st2, p)
    val dupRows = dup.collect()
    val xs = dupRows.filter(_.getString(0) == "x")
      .map(r => (r.getLong(1), r.getString(2)) -> bits(r.getDouble(3))).toMap
    val ys = dupRows.filter(_.getString(0) == "y")
      .map(r => (r.getLong(1), r.getString(2)) -> bits(r.getDouble(3))).toMap
    assert(xs.nonEmpty && xs == ys)
    val dupWindows = "\\bWindow\\b".r.findAllIn(dup.queryExecution
      .executedPlan.toString.split("== Initial Plan ==").head).size
    assert(dupWindows == 1,
      s"duplicate panels must share one engine pass, saw $dupWindows Windows")

    // an @-pinned panel reads OUTSIDE the other panels' window — the time
    // prefilter must bail out for the whole set or the pin comes back empty
    val p2 = QueryParams(start + 2L * 86400000L, start + 4L * 86400000L, p.stepMs)
    val pinQ = s"sum(events_value @ ${start / 1000})"
    val taggedPin = Engine.queryMultiTagged(Seq(
      "pin" -> pinQ, "sum_v" -> "sum(events_value)"), st2, p2)
    val gotPin = taggedPin.filter(col("alias") === "pin").collect()
      .map(r => r.getLong(1) -> bits(r.getDouble(3))).toMap
    val wantPin = Engine.query(pinQ, st2, p2).collect()
      .map(r => r.getLong(0) -> bits(r.getDouble(1))).toMap
    assert(gotPin.nonEmpty && gotPin == wantPin)
  }

  test("queryMulti agg-window fusion equals the per-panel query() answers bit-for-bit") {
    // the dominant dashboard shape (r14 VERDICT #1): agg by (...) of a
    // range function, N panels over one selector — fused = standalone
    val multi = Engine.queryMulti(Seq(
      "sum_rate" -> "sum(rate(events_value[4h]))",
      "max_inc" -> "max(increase(events_value[4h]))",
      "avg_aot" -> "avg(avg_over_time(events_value[4h]))"), store, p)
    assert(multi.columns.toSeq == Seq("ts", "sum_rate", "max_inc", "avg_aot"))
    def one(q: String): Map[Long, Double] =
      Engine.query(q, store, p).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (sr, mi, aa) = (one("sum(rate(events_value[4h]))"),
      one("max(increase(events_value[4h]))"),
      one("avg(avg_over_time(events_value[4h]))"))
    val fused = multi.collect().map(r => r.getLong(0) ->
      ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(fused.keySet == sr.keySet && fused.nonEmpty)
    def eq(a: Double, b: Double) = (a.isNaN && b.isNaN) ||
      java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)
    fused.foreach { case (ts, (s2, m2, a2)) =>
      assert(eq(s2, sr(ts)) && eq(m2, mi(ts)) && eq(a2, aa(ts)),
        s"ts=$ts diverged from the standalone answers")
    }
    // by-grouping: series identity on the single-label store — each group's
    // sum-of-rates equals the standalone form exactly
    val byType = Engine.queryMulti(Seq(
      "sr" -> "sum by (attr_event_type) (rate(events_value[4h]))"), store, p)
    val byOne = Engine.query(
      "sum by (attr_event_type) (rate(events_value[4h]))", store, p)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    byType.collect().foreach { r =>
      assert(eq(r.getDouble(2), byOne((r.getLong(0), r.getString(1)))))
    }
    // contract violations throw at plan time: mixed grouping, mixed
    // selector range, unfusable inner fn, parameterized agg
    intercept[IllegalArgumentException] {
      Engine.queryMulti(Seq(
        "a" -> "sum by (attr_event_type) (rate(events_value[4h]))",
        "b" -> "max(rate(events_value[4h]))"), store, p)
    }
    intercept[IllegalArgumentException] {
      Engine.queryMulti(Seq("a" -> "sum(rate(events_value[4h]))",
        "b" -> "max(increase(events_value[6h]))"), store, p)
    }
    intercept[IllegalArgumentException] {
      Engine.queryMulti(Seq("a" -> "sum(irate(events_value[4h]))"), store, p)
    }
    intercept[IllegalArgumentException] {
      Engine.queryMulti(Seq("a" -> "topk(2, rate(events_value[4h]))"), store, p)
    }
  }

  test("rate = windowed sum / range seconds with coverage rule") {
    val range = 24L * 3600000L
    val rate = Engine.query(s"rate(events_value[1d])", store, p)
      .filter(!isnan(col("value")))
    val inc = Engine.query(s"increase(events_value[1d])", store, p)
      .filter(!isnan(col("value")))
    val j = rate.withColumnRenamed("value", "r")
      .join(inc.withColumnRenamed("value", "i"), Seq("ts", "attr_event_type"))
    val mismatch = j.filter(abs(col("r") * lit(range / 1000.0) - col("i")) > 1e-6).count()
    assert(mismatch == 0 && j.count() > 0)
  }

  test("sum() collapses labels; count() counts series") {
    val df = Engine.query("count(events_value)", store, p)
    assert(df.columns.toSeq == Seq("ts", "value"))
    val mx = df.agg(max(col("value"))).head().getDouble(0)
    assert(mx <= 5.0 && mx >= 1.0) // 5 event types
  }

  test("count() densifies: every grid bucket present, empty buckets = 0") {
    val df = Engine.query(
      """count by (attr_event_type) (events_value{attr_event_type="signup"})""",
      store, p)
    val buckets = (p.endMs - start) / p.stepMs
    // one group (signup) × full grid, zero-filled where sparse data is absent
    assert(df.count() == buckets)
    assert(df.filter(col("value") === 0.0).count() > 0) // sf0.001 has gaps
    assert(df.filter(col("ts") % p.stepMs =!= 0).count() == 0)
  }

  test("vector-vector self subtraction is zero") {
    val df = Engine.query("events_value - events_value", store, p)
    assert(df.filter(col("value") =!= 0.0).count() == 0 && df.count() > 0)
  }

  test("or with disjoint selectors unions both") {
    val a = Engine.query("""events_value{attr_event_type="error"}""", store, p).count()
    val b = Engine.query("""events_value{attr_event_type="click"}""", store, p).count()
    val u = Engine.query(
      """events_value{attr_event_type="error"} or events_value{attr_event_type="click"}""",
      store, p).count()
    assert(u == a + b)
  }

  test("empty-label side broadcasts as scalar") {
    val df = Engine.query("events_value / sum(events_value)", store, p)
    assert(df.columns.contains("attr_event_type"))
    val over = df.filter(col("value") > 1.0 + 1e-9).count()
    assert(over == 0 && df.count() > 0)
  }

  test("scalar literal expression yields grid") {
    val df = Engine.query("3 * 4", store, p)
    assert(df.select("value").distinct().head().getDouble(0) == 12.0)
  }

  test("deriv of a linear gauge recovers the slope; predict_linear extends it") {
    // synthetic store: value = 2·t_sec + 5, exactly one sample per 10m
    // bucket (bucket gauge == the sample, so the fit is exact)
    import spark.implicits._
    val rows = (0 until 12).map { i =>
      (start + i * 600000L, "lin_gauge", 2.0 * (i * 600) + 5.0, 1.0)
    }
    val df = rows.toDF("chq_timestamp", "metric_name", "chq_rollup_sum", "chq_rollup_count")
      .withColumn("chq_rollup_min", col("chq_rollup_sum"))
      .withColumn("chq_rollup_max", col("chq_rollup_sum"))
    val st = MetricStore(df)
    val pp = QueryParams(start, start + 7200000L, 600000L) // 10m step, 2h span
    val d = Engine.query("deriv(lin_gauge[30m])", st, pp)
      .filter(!isnan(col("value")))
    assert(d.count() > 0)
    assert(d.filter(abs(col("value") - 2.0) > 1e-9).count() == 0)
    // predict 100s ahead of a line v(t)=2t+5 anchored at bucket start:
    // value = 2·(t_now + 100) + 5 where t_now is the bucket's second offset
    val pl = Engine.query("predict_linear(lin_gauge[30m], 100)", st, pp)
      .filter(!isnan(col("value")))
    val bad = pl.filter(
      abs(col("value") - (lit(2.0) * ((col("ts") - lit(start)) / 1000.0 + 100.0) + 5.0)) > 1e-6)
    assert(bad.count() == 0 && pl.count() > 0)
  }

  test("changes and resets count transitions over the window") {
    import spark.implicits._
    // one sample per 40s bucket, gauge cycle 1,1,2,1 → per-bucket transition
    // indicators cycle [0,1,1,0] (changes) and [0,0,1,0] (resets)
    val vals = Seq(1.0, 1.0, 2.0, 1.0)
    val rows = (0 until 24).map { i =>
      (start + i * 40000L, "saw", vals(i % 4), 1.0)
    }
    val df = rows.toDF("chq_timestamp", "metric_name", "chq_rollup_sum", "chq_rollup_count")
      .withColumn("chq_rollup_min", col("chq_rollup_sum"))
      .withColumn("chq_rollup_max", col("chq_rollup_sum"))
    val st = MetricStore(df)
    val pp = QueryParams(start, start + 24 * 40000L, 40000L)
    val ch = Engine.query("changes(saw[160s])", st, pp).filter(!isnan(col("value")))
    val rs = Engine.query("resets(saw[160s])", st, pp).filter(!isnan(col("value")))
    // a [160s] window = 4 buckets = 3 in-window transitions: consecutive
    // triples of the indicator cycles sum to changes ∈ {1,2}, resets ∈ {0,1}
    assert(ch.count() > 0 && rs.count() > 0)
    assert(ch.filter(col("value") < 1.0 || col("value") > 2.0).count() == 0)
    assert(rs.filter(col("value") < 0.0 || col("value") > 1.0).count() == 0)
    // variance is never negative
    val sv = Engine.query("stdvar_over_time(saw[160s])", st, pp)
    assert(sv.filter(col("value") < -1e-12).count() == 0)
  }

  test("gauge fns without a range selector are rejected") {
    intercept[IllegalArgumentException] {
      Engine.query("deriv(events_value)", store, p).collect()
    }
  }

  test("absent_over_time complements windowed presence on the grid") {
    val range = 12L * 3600000L
    val absent = Engine.query(
      """absent_over_time(events_value{attr_event_type="signup"}[12h])""",
      store, p)
    val present = Engine.query(
      """present_over_time(events_value{attr_event_type="signup"}[12h])""",
      store, p)
    // absent buckets and buckets holding a sample never overlap, and absent
    // only fires when the window truly has no sample
    val overlap = absent.select("ts")
      .join(present.select("ts"), "ts").count()
    assert(overlap == 0)
    val grid = (p.endMs - p.startMs) / p.stepMs
    assert(absent.count() <= grid)
  }

  test("time components read the sample VALUE as epoch seconds") {
    // Prometheus semantics: hour(v) interprets v's samples as epoch
    // seconds (funcHour uses el.F) — so hour over timestamp() yields the
    // grid hour, while hour over a small gauge value is 1970-01-01-ish
    // regardless of the evaluation time.
    // 2024-01-01T00:00:00Z is a Monday (dow 1), January, day 1
    val df = Engine.query("hour(timestamp(events_value))", store, p)
      .filter(org.apache.spark.sql.functions.col("ts") === start)
    assert(df.select("value").distinct().head().getDouble(0) == 0.0)
    val dow = Engine.query("day_of_week(timestamp(events_value))", store, p)
      .filter(org.apache.spark.sql.functions.col("ts") === start)
    assert(dow.select("value").distinct().head().getDouble(0) == 1.0)
    val dim = Engine.query("days_in_month(timestamp(events_value))", store, p)
      .filter(org.apache.spark.sql.functions.col("ts") === start)
    assert(dim.select("value").distinct().head().getDouble(0) == 31.0)
    // small gauge values land in 1970: year == 1970 everywhere
    val yr = Engine.query("year(events_value)", store, p)
    assert(yr.select("value").distinct().collect().map(_.getDouble(0)).toSet
      == Set(1970.0))
  }

  test("stddev agg: exact cross-series population variance") {
    import spark.implicits._
    // two series per bucket with values 1 and 3 → var_pop = 1, stddev = 1
    val rows = Seq(
      (start, "m", "a", 1.0, 1.0), (start, "m", "b", 3.0, 1.0),
      (start + 600000L, "m", "a", 1.0, 1.0), (start + 600000L, "m", "b", 3.0, 1.0))
    val df = rows.toDF("chq_timestamp", "metric_name", "attr_k", "chq_rollup_sum", "chq_rollup_count")
      .withColumn("chq_rollup_min", col("chq_rollup_sum"))
      .withColumn("chq_rollup_max", col("chq_rollup_sum"))
    val st = MetricStore(df)
    val pp = QueryParams(start, start + 1200000L, 600000L)
    val sv = Engine.query("stdvar(m)", st, pp)
    assert(sv.select("value").collect().forall(_.getDouble(0) == 1.0))
    val g = Engine.query("group by (attr_k) (m)", st, pp)
    assert(g.count() == 4 && g.select("value").distinct().head().getDouble(0) == 1.0)
  }

  test("expression subqueries window over evaluated points") {
    import spark.implicits._
    // one sample per 40s bucket, values 1..6
    val rows = (0 until 6).map(i => (start + i * 40000L, "g", (i + 1).toDouble, 1.0))
    val df = rows.toDF("chq_timestamp", "metric_name", "chq_rollup_sum", "chq_rollup_count")
      .withColumn("chq_rollup_min", col("chq_rollup_sum"))
      .withColumn("chq_rollup_max", col("chq_rollup_sum"))
    val st = MetricStore(df)
    val pp = QueryParams(start, start + 6 * 40000L, 40000L)
    // sum_over_time of the last-3-buckets window over bare-selector points:
    // at ts of bucket i (0-based, i≥2): v(i)+v(i-1)+v(i-2)
    val out = Engine.query("sum_over_time((g)[120s:40s])", st, pp)
      .collect().map(r => r.getLong(0) -> r.getDouble(r.length - 1)).toMap
    assert(out(start + 2 * 40000L) == 1.0 + 2.0 + 3.0, out.toString)
    assert(out(start + 5 * 40000L) == 4.0 + 5.0 + 6.0, out.toString)
    // windows with fewer points still emit (no coverage gate on subqueries)
    assert(out(start) == 1.0)
    // parses nested inside a range fn over a non-selector expression
    val mx = Engine.query("max_over_time(rate(g[40s])[120s:40s])", st, pp)
    assert(mx.count() > 0)
  }

  test("count_values groups by formatted value; integral values format bare") {
    import spark.implicits._
    val rows = Seq(
      (start, "m", "a", 7.0, 1.0), (start, "m", "b", 7.0, 1.0),
      (start, "m", "c", 2.5, 1.0))
    val df = rows.toDF("chq_timestamp", "metric_name", "attr_k", "chq_rollup_sum", "chq_rollup_count")
      .withColumn("chq_rollup_min", col("chq_rollup_sum"))
      .withColumn("chq_rollup_max", col("chq_rollup_sum"))
    val pp = QueryParams(start, start + 600000L, 600000L)
    val out = Engine.query("""count_values("v", m)""", MetricStore(df), pp)
      .select("v", "value").collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(out == Set(("7", 2.0), ("2.5", 1.0)), out.toString)
  }

  test("@ modifier pins evaluation; start() and a literal agree") {
    val lit = Engine.query(s"events_value @ ${start / 1000}", store, p)
    val st = Engine.query("events_value @ start()", store, p)
    assert(lit.exceptAll(st).count() == 0 && st.exceptAll(lit).count() == 0)
    // pinned: per-series value set equals the bare selector's first bucket,
    // repeated on every grid bucket
    val bare = Engine.query("events_value", store, p)
      .filter(col("ts") === start)
      .select("attr_event_type", "value").collect().toSet
    val grid = (p.endMs - start) / p.stepMs
    assert(lit.count() == grid * bare.size)
    val pinnedSet = lit.select("attr_event_type", "value").distinct().collect().toSet
    assert(pinnedSet == bare)
  }

  test("@ pin threads through sketch leaves and absent_over_time") {
    import spark.implicits._
    import graft.sketch.{functions => gf}
    // tiny sketch store: two series, values differ per bucket so a wrong
    // pin is detectable
    val raw = Seq(
      (start, "a", 1.0), (start, "a", 3.0), (start, "b", 10.0),
      (start + 600000L, "a", 100.0), (start + 600000L, "b", 200.0))
      .toDF("chq_timestamp", "attr_k", "v")
    val cooked = raw.groupBy(col("chq_timestamp"), col("attr_k"))
      .agg(gf.ddsketch_agg(col("v")).as("chq_sketch"),
        sum(col("v")).as("chq_rollup_sum"),
        count(lit(1)).cast("double").as("chq_rollup_count"))
      .withColumn("metric_name", lit("m"))
      .withColumn("chq_rollup_min", col("chq_rollup_sum"))
      .withColumn("chq_rollup_max", col("chq_rollup_sum"))
    val st = MetricStore(cooked)
    val pp = QueryParams(start, start + 3000000L, 600000L)
    // quantile_over_time pinned at the FIRST bucket: every grid bucket
    // carries the first bucket's per-series quantile (not the second's)
    val pinned = Engine.query(
      s"quantile_over_time(0.5, m[10m] @ ${start / 1000})", st, pp)
    val unpinnedFirst = Engine.query("quantile_over_time(0.5, m[10m])", st,
      QueryParams(start, start + 600000L, 600000L))
      .select("attr_k", "value").collect().toSet
    val grid = (pp.endMs - pp.startMs) / pp.stepMs
    assert(pinned.count() == grid * unpinnedFirst.size)
    assert(pinned.select("attr_k", "value").distinct().collect().toSet
      == unpinnedFirst)
    // absent_over_time pinned at a bucket WITH data → empty on every grid
    // bucket; pinned past the data → present on every grid bucket
    val absPinnedData = Engine.query(
      s"absent_over_time(m[10m] @ ${start / 1000})", st, pp)
    assert(absPinnedData.count() == 0)
    val farMs = start + 86400000L
    val absPinnedGap = Engine.query(
      s"absent_over_time(m[10m] @ ${farMs / 1000})", st, pp)
    assert(absPinnedGap.count() == grid)
  }

  test("group_left carries include labels; group_right mirrors; dup one side errors") {
    import spark.implicits._
    // m1: two series per attr_k (the many side); m2: one series per attr_k
    // with an info label to copy
    val rows = Seq(
      (start, "m1", "k1", "x", null, 2.0), (start, "m1", "k1", "y", null, 3.0),
      (start, "m1", "k2", "x", null, 5.0), (start, "m1", "k2", "y", null, 7.0),
      (start, "m2", "k1", null, "alpha", 10.0), (start, "m2", "k2", null, "beta", 100.0))
    val df = rows.toDF("chq_timestamp", "metric_name", "attr_k", "attr_b", "attr_info", "chq_rollup_sum")
      .withColumn("chq_rollup_count", lit(1.0))
      .withColumn("chq_rollup_min", col("chq_rollup_sum"))
      .withColumn("chq_rollup_max", col("chq_rollup_sum"))
    val st = MetricStore(df)
    val pp = QueryParams(start, start + 600000L, 600000L)
    val gl = Engine.query("m1 * on(attr_k) group_left(attr_info) m2", st, pp)
      .select("attr_k", "attr_b", "attr_info", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3))).toSet
    assert(gl == Set(
      ("k1", "x", "alpha", 20.0), ("k1", "y", "alpha", 30.0),
      ("k2", "x", "beta", 500.0), ("k2", "y", "beta", 700.0)), gl.toString)
    // group_right: one side on the left, same result set
    val gr = Engine.query("m2 * on(attr_k) group_right(attr_info) m1", st, pp)
      .select("attr_k", "attr_b", "attr_info", "value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3))).toSet
    assert(gr == gl, gr.toString)
    // a duplicate series on the one side is a hard error, like Prometheus
    val dupRows = rows ++ Seq((start, "m2", "k1", "z", "gamma", 11.0))
    val dupDf = dupRows.toDF("chq_timestamp", "metric_name", "attr_k", "attr_b", "attr_info", "chq_rollup_sum")
      .withColumn("chq_rollup_count", lit(1.0))
      .withColumn("chq_rollup_min", col("chq_rollup_sum"))
      .withColumn("chq_rollup_max", col("chq_rollup_sum"))
    val ex = intercept[Exception] {
      Engine.query("m1 * on(attr_k) group_left m2", MetricStore(dupDf), pp).collect()
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: causes(t.getCause)
    assert(causes(ex).exists(m => m != null && m.contains("duplicate series")), ex.getMessage)
  }

  test("trig and hyperbolic functions match JDK math; inverses round-trip") {
    def one(q: String): Double =
      Engine.query(q, store, p).filter(col("ts") === start)
        .select("value").head().getDouble(0)
    val v = one("events_value")
    assert(math.abs(one("sin(events_value)") - math.sin(v)) < 1e-12)
    assert(math.abs(one("cosh(events_value)") - math.cosh(v)) < 1e-9 * math.cosh(v))
    // inverse round-trips (tanh output ∈ (−1,1) is atanh's domain)
    assert(math.abs(one("asinh(sinh(events_value))") - v) < 1e-6 * math.max(1.0, v))
    assert(math.abs(one("atanh(tanh(events_value))") - v) < 1e-6 * math.max(1.0, v) ||
      v > 19) // tanh saturates to 1.0 beyond ~19, atanh(1) = ∞
    assert(math.abs(one("deg(rad(events_value))") - v) < 1e-9 * math.max(1.0, v))
    assert(one("pi()") == math.Pi)
  }

  test("clamp bounds both sides; min > max yields NaN everywhere") {
    val c = Engine.query("clamp(events_value, 2, 8)", store, p)
    assert(c.filter(col("value") < 2.0 || col("value") > 8.0).count() == 0)
    assert(c.count() > 0)
    val n = Engine.query("clamp(events_value, 5, 1)", store, p)
    assert(n.filter(!isnan(col("value"))).count() == 0 && n.count() > 0)
  }

  test("double_exponential_smoothing replays the Prometheus recurrence") {
    import spark.implicits._
    // one sample per 40s bucket → bucket gauge == the sample
    val vals = Seq(10.0, 12.0, 11.0, 15.0, 14.0, 16.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (start + i * 40000L, "g", v, 1.0)
    }
    val df = rows.toDF("chq_timestamp", "metric_name", "chq_rollup_sum", "chq_rollup_count")
      .withColumn("chq_rollup_min", col("chq_rollup_sum"))
      .withColumn("chq_rollup_max", col("chq_rollup_sum"))
    val st = MetricStore(df)
    val pp = QueryParams(start, start + 6 * 40000L, 40000L)
    def des(vs: Seq[Double], sf: Double, tf: Double): Double = {
      var s0 = 0.0; var s1 = vs(0); var b = vs(1) - vs(0)
      for (i <- 1 until vs.length) {
        val bNew = if (i == 1) b else tf * (s1 - s0) + (1 - tf) * b
        b = bNew
        val x = sf * vs(i); val y = (1 - sf) * (s1 + b)
        s0 = s1; s1 = x + y
      }
      s1
    }
    val out = Engine.query("double_exponential_smoothing(g[240s], 0.5, 0.5)", st, pp)
      .filter(!isnan(col("value")))
    // only the last bucket has full [240s] coverage: its window is all 6 values
    val got = out.filter(col("ts") === start + 5 * 40000L)
      .select("value").head().getDouble(0)
    assert(math.abs(got - des(vals, 0.5, 0.5)) < 1e-12, s"got $got")
    // holt_winters spells the same function
    val alias = Engine.query("holt_winters(g[240s], 0.5, 0.5)", st, pp)
      .filter(col("ts") === start + 5 * 40000L).select("value").head().getDouble(0)
    assert(alias == got)
  }

  test("limitk keeps k hash-chosen series; limit_ratio pairs tile the vector") {
    val bare = Engine.query("events_value", store, p)
    val lk = Engine.query("limitk(3, events_value)", store, p)
    // survivors are a subset of the bare vector
    assert(lk.join(bare, Seq("ts", "attr_event_type", "value"), "left_anti").count() == 0)
    // per bucket exactly min(3, series present in that bucket) survive
    val bareN = bare.groupBy("ts").agg(countDistinct(col("attr_event_type")).as("bn"))
    val lkN = lk.groupBy("ts").agg(countDistinct(col("attr_event_type")).as("kn"))
    val bad = lkN.join(bareN, "ts")
      .filter(col("kn") =!= least(lit(3), col("bn"))).count()
    assert(bad == 0)
    // complementary pair tiles the bare vector exactly, no overlap
    val a = Engine.query("limit_ratio(0.4, events_value)", store, p)
    val b = Engine.query("limit_ratio(-0.6, events_value)", store, p)
    assert(a.intersect(b).count() == 0)
    assert(a.union(b).exceptAll(bare).count() == 0)
    assert(bare.exceptAll(a.union(b)).count() == 0)
  }

  test("mad_over_time: constant series is 0; [1,2,4] window has MAD 1") {
    import spark.implicits._
    val vals = Seq(1.0, 2.0, 4.0)
    val rows = vals.zipWithIndex.map { case (v, i) => (start + i * 40000L, "g", v, 1.0) }
    val df = rows.toDF("chq_timestamp", "metric_name", "chq_rollup_sum", "chq_rollup_count")
      .withColumn("chq_rollup_min", col("chq_rollup_sum"))
      .withColumn("chq_rollup_max", col("chq_rollup_sum"))
    val pp = QueryParams(start, start + 3 * 40000L, 40000L)
    // last bucket's [120s] window = all three values: median 2 → |dev| [1,0,2] → MAD 1
    val got = Engine.query("mad_over_time(g[120s])", MetricStore(df), pp)
      .filter(col("ts") === start + 2 * 40000L).select("value").head().getDouble(0)
    assert(got == 1.0, s"got $got")
    // a constant gauge deviates by 0 everywhere
    val const = Engine.query("mad_over_time(g[120s])", MetricStore(
      df.withColumn("chq_rollup_sum", lit(7.0))
        .withColumn("chq_rollup_min", lit(7.0)).withColumn("chq_rollup_max", lit(7.0))), pp)
      .filter(!isnan(col("value")))
    assert(const.filter(col("value") =!= 0.0).count() == 0 && const.count() > 0)
  }

  test("classic histogram_quantile interpolates inside le buckets") {
    import spark.implicits._
    // cumulative buckets at one ts: le=1 → 1, le=2 → 3, +Inf → 4
    val rows = Seq(
      (start, "h", "1", 1.0), (start, "h", "2", 3.0), (start, "h", "+Inf", 4.0))
    val df = rows.toDF("chq_timestamp", "metric_name", "le", "chq_rollup_sum")
      .withColumn("chq_rollup_count", lit(1.0))
      .withColumn("chq_rollup_min", col("chq_rollup_sum"))
      .withColumn("chq_rollup_max", col("chq_rollup_sum"))
    val st = MetricStore(df)
    val pp = QueryParams(start, start + 600000L, 600000L)
    def hq(q: Double): Double =
      Engine.query(s"histogram_quantile($q, h)", st, pp).select("value").head().getDouble(0)
    // rank 2 lands in (1,2]: 1 + (2-1)·(2-1)/(3-1) = 1.5
    assert(hq(0.5) == 1.5, s"got ${hq(0.5)}")
    // rank 3.8 lands in +Inf → highest finite bound
    assert(hq(0.95) == 2.0)
    // rank 0.4 lands in the first bucket: interpolate from 0
    assert(hq(0.1) == 0.4)
    // labels minus le survive; le itself is consumed
    val out = Engine.query("histogram_quantile(0.5, h)", st, pp)
    assert(!out.columns.contains("le"))
  }

  test("sort_by_label parses and preserves the sample set") {
    val sorted = Engine.query("""sort_by_label(events_value, "attr_event_type")""", store, p)
    val bare = Engine.query("events_value", store, p)
    assert(sorted.exceptAll(bare).count() == 0 && bare.exceptAll(sorted).count() == 0)
  }
}
