package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.logql._
import graft.promql.{MatchOp, QueryParams}
import org.apache.spark.sql.functions._

class LogQLParserSpec extends AnyFunSuite {
  private def p(s: String): LogQuery =
    Parser.parse(s).fold(e => fail(s"parse '$s': $e"), identity)

  test("raw pipeline with line filters and stages") {
    val q = p("""{app="web", env!="dev"} |= "error" != "debug" | logfmt | latency > 250ms | drop tmp""")
    val pipe = q.raw.get
    assert(pipe.matchers.head.op == MatchOp.Eq)
    assert(pipe.stages.collect { case l: LineFilter => l }.size == 2)
    assert(pipe.stages.exists {
      case LabelFilter("latency", ">", "250ms", true) => true; case _ => false
    })
    assert(pipe.stages.contains(DropStage(List("tmp" -> None))))
  }

  test("selector requires an equality matcher") {
    assert(Parser.parse("""{app=~"w.*"} |= "x"""").isLeft)
  }

  test("label_replace stage parses with bare and quoted label args") {
    val q = p("""{app="web"} | label_replace(dst, "x-$1", src, "s-(.*)")""")
    assert(q.raw.get.stages.contains(
      LabelReplaceStage("dst", "x-$1", "src", "s-(.*)")))
    val q2 = p("""{app="web"} | label_replace("d", "$1", "s", "(.+)")""")
    assert(q2.raw.get.stages.contains(LabelReplaceStage("d", "$1", "s", "(.+)")))
  }

  test("pattern stage parses and compiles to an anchored regex") {
    val q = p("""{app="web"} | pattern `<evt> took <ms> in <_>`""")
    assert(q.raw.get.stages.contains(PatternStage("<evt> took <ms> in <_>")))
    val (re, names) = Compiler.patternToRegex("<evt> took <ms>ms (in <_>)")
    assert(names == Seq("evt", "ms"))
    assert(re == "^(.*?) took (.*?)ms \\(in .*?\\)$")
  }

  test("keep_labels/drop_labels/decolorize parse (reference stage keywords)") {
    val q = p("""{app="web"} | logfmt | keep_labels evt | decolorize | drop_labels tmp""")
    assert(q.raw.get.stages.contains(KeepStage(List("evt" -> None))))
    assert(q.raw.get.stages.contains(DropStage(List("tmp" -> None))))
    assert(q.raw.get.stages.contains(DecolorizeStage))
    // bare forms are accepted as no-ops, as in the reference parser
    assert(Parser.parse("""{app="web"} | keep_labels | drop_labels""").isRight)
  }

  test("vector agg over range agg with by") {
    val q = p("""sum by (app) (rate({app="web"} |= "e" [5m]))""")
    assert(q.vectorOp.contains("sum") && q.by == List("app"))
    assert(q.range.get.fn == "rate" && q.range.get.rangeMs == 300000L)
  }

  test("stddev/stdvar parse as range and vector aggregations") {
    val r = p("""stdvar_over_time({app="web"} | logfmt | unwrap u [5m])""")
    assert(r.range.get.fn == "stdvar_over_time")
    val v = p("""stddev by (app) (count_over_time({app="web"} [5m]))""")
    assert(v.vectorOp.contains("stddev") && v.by == List("app"))
    val s = p("""sort_desc(count_over_time({app="web"} [5m]))""")
    assert(s.vectorOp.contains("sort_desc"))
  }

  test("range offset parses (reference LogRange.Offset)") {
    val q = p("""sum by (app) (count_over_time({app="web"}[5m] offset 1h))""")
    assert(q.range.get.rangeMs == 300000L && q.range.get.offsetMs == 3600000L)
    assert(p("""rate({app="web"}[5m])""").range.get.offsetMs == 0L)
    // a negative offset is rejected with an EXPLICIT error, never a
    // silent sign-flip (signed look-ahead offsets live in PromQL only)
    val err = Parser.parseFull(
      """rate({app="web"}[5m] offset -1h)""").swap.toOption.get
    assert(err.contains("negative offset"), err)
  }

  test("binop expressions parse with precedence (reference KindBinOp)") {
    val e = Parser.parseFull(
      """sum by (s)(rate({a="b"}[5m])) / sum by (s)(rate({a="c"}[5m])) > 0.5""")
      .toOption.get
    e match {
      case LogBin(">", LogBin("/", LeafQuery(_), LeafQuery(_)), NumberLeaf(0.5)) => ()
      case other => fail(s"unexpected shape: $other")
    }
    // mul binds tighter than add
    val e2 = Parser.parseFull("""2 + 3 * rate({a="b"}[5m])""").toOption.get
    e2 match {
      case LogBin("+", NumberLeaf(2.0), LogBin("*", NumberLeaf(3.0), LeafQuery(_))) => ()
      case other => fail(s"unexpected shape: $other")
    }
    // raw pipelines cannot be binop operands, but stand alone fine
    assert(Parser.parseFull("""{a="b"} |= "x"""").isRight)
    assert(Parser.parseFull("""rate({a="b"}[5m]) / ({a="b"} |= "x")""").isLeft)
  }

  test("topk with param and unwrap with conversion") {
    val q = p("""topk(3, sum_over_time({a="b"} | logfmt | unwrap duration(took) [1m]))""")
    assert(q.param.contains(3.0))
    assert(q.range.get.pipeline.stages.exists {
      case UnwrapStage("took", "duration") => true; case _ => false
    })
  }

  test("validate endpoints accept good queries and reject bad ones") {
    import graft.api.Discovery
    assert(Discovery.validatePromQL("sum by (a) (rate(m[5m]))").isRight)
    assert(Discovery.validatePromQL("rate(m[5m").isLeft)
    assert(Discovery.validateLogQL("""{a="b"} |= "x" | logfmt""").isRight)
    assert(Discovery.validateLogQL(
      """sum by (s)(rate({a="b"}[5m])) / sum by (s)(rate({a="c"}[5m]))""").isRight)
    assert(Discovery.validateLogQL("""{a=~"b"} |= "x"""").isLeft) // no eq matcher
  }

  test("templates parse refs and pipes") {
    val t = Parser.parseTemplate("x={{.a}}-{{.b | ToUpper}}!")
    assert(t.parts == List(Lit("x="), Ref("a"), Lit("-"), Ref("b", "upper"), Lit("!")))
  }

  test("templates parse trim/len pipes and if/else conditionals") {
    val t = Parser.parseTemplate("{{.a | trim}}:{{.b | len}}")
    assert(t.parts == List(Ref("a", "trim"), Lit(":"), Ref("b", "len")))

    val c = Parser.parseTemplate("""{{if hasPrefix "p" .evt}}buy{{else}}no{{end}}-{{.x}}""")
    assert(c.parts == List(
      Cond(Pred("hasPrefix", LitArg("p"), FieldArg("evt")),
        Template(List(Lit("buy"))), Template(List(Lit("no")))),
      Lit("-"), Ref("x")))

    val noElse = Parser.parseTemplate("""{{if eq .a .b}}same{{end}}""")
    assert(noElse.parts == List(
      Cond(Pred("eq", FieldArg("a"), FieldArg("b")),
        Template(List(Lit("same"))), Template(Nil))))

    // nested conditionals
    val nested = Parser.parseTemplate(
      """{{if contains "x" .a}}{{if match "^y" .b}}both{{end}}{{end}}""")
    assert(nested.parts.head.isInstanceOf[Cond])

    assert(Parser.parse(
      """{x="1"} | label_format k=`{{if hasSuffix "z" .a}}t{{end}}`""").isRight)
    // unbalanced raises
    intercept[Parser.ParseError](Parser.parseTemplate("{{if eq .a .b}}oops"))
  }
}

class LogQLCompilerSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val store = LogStore(graft.model.Cooked.logs(spark, sf))
  private val start = 1704067200000L
  private val p = QueryParams(start, start + 14L * 86400000L, 21600000L)

  test("ip() line and label filters: single, range, and CIDR forms") {
    import spark.implicits._
    val rows = Seq(
      (1704067200000L, "a", "conn from 10.1.2.3 established", "svc", "x"),
      (1704067201000L, "a", "conn from 10.200.2.3 refused", "svc", "x"),
      (1704067202000L, "a", "src=192.168.5.77 ok", "svc", "x"),
      (1704067203000L, "a", "no address here 999.1.1.1 or 1.2.3", "svc", "x"))
      .toDF("chq_timestamp", "log_level", "log_message",
        "resource_service_name", "attr_event_type")
      .withColumn("chq_tsns", col("chq_timestamp") * 1000000L)
    val st = LogStore(rows)
    val pp = QueryParams(1704067200000L, 1704067300000L, 3600000L)
    def ids(q: String): Set[Long] = {
      val parsed = Parser.parse(q).toOption.get
      Compiler.rawQuery(parsed.raw.get, st, pp.startMs, pp.endMs, 1000,
        fields = Seq("chq_timestamp")).collect().map(_.getLong(0)).toSet
    }
    // CIDR: 10.0.0.0/9 covers second octet 0..127 → first line only
    assert(ids("""{attr_event_type="x"} |= ip("10.0.0.0/9")""") ==
      Set(1704067200000L))
    // range + negation
    assert(ids("""{attr_event_type="x"} |= ip("10.1.2.1-10.200.2.3")""") ==
      Set(1704067200000L, 1704067201000L))
    assert(ids("""{attr_event_type="x"} != ip("10.0.0.0/8")""") ==
      Set(1704067202000L, 1704067203000L))
    // single IP; 999.x and 3-octet shapes never parse as addresses
    assert(ids("""{attr_event_type="x"} |= ip("192.168.5.77")""") ==
      Set(1704067202000L))
    // label form after a pattern stage extracts then range-checks
    assert(ids("""{attr_event_type="x"} | pattern "src=<addr> ok" | addr = ip("192.168.0.0/16")""") ==
      Set(1704067202000L))
    assert(ids("""{attr_event_type="x"} | pattern "conn from <addr> <st>" | addr != ip("10.0.0.0/9")""") ==
      Set(1704067201000L, 1704067202000L, 1704067203000L))
    // malformed patterns are parse-time errors
    assert(Parser.parse("""{a="x"} |= ip("10.0.0/8")""").isLeft)
    assert(Parser.parse("""{a="x"} |= ip("10.0.0.0/40")""").isLeft)
    assert(Parser.parse("""{a="x"} |= ip("10.0.0.9-10.0.0.1")""").isLeft)
  }

  test("raw query filters and extracts logfmt labels") {
    val q = Parser.parse("""{log_level="ERROR"} | logfmt | evt="error" """).toOption.get
    val df = Compiler.rawQuery(q.raw.get, store, p.startMs, p.endMs, 100000,
      fields = Seq("chq_timestamp", "evt", "user"))
    assert(df.columns.toSeq == Seq("chq_timestamp", "evt", "user"))
    val n = df.count()
    assert(n > 0)
    assert(df.filter(col("evt") =!= "error").count() == 0)
  }

  test("exprQuery threads limit/fields to a top-level raw leaf") {
    val e = Parser.parseFull("""{log_level="ERROR"}""").toOption.get
    val df = Compiler.exprQuery(e, store, p, limit = 7,
      fields = Seq("chq_timestamp", "log_message"))
    assert(df.columns.toSeq == Seq("chq_timestamp", "log_message"))
    assert(df.count() == 7)
  }

  test("raw pipeline inside a binary expression is rejected (reference parity)") {
    // the parser refuses it outright …
    assert(Parser.parseFull(
      """{log_level="ERROR"} + count_over_time({log_level="INFO"}[5m])""").isLeft)
    // … and the compiler guards a hand-built AST the same way
    val rawLeaf = LeafQuery(LogQuery(range = None,
      raw = Some(LogPipeline(
        List(graft.promql.Matcher("log_level", graft.promql.MatchOp.Eq, "ERROR")), Nil))))
    val agg = Parser.parseFull("""count_over_time({log_level="INFO"}[5m])""").toOption.get
    val ex = intercept[IllegalArgumentException] {
      Compiler.exprQuery(LogBin("+", rawLeaf, agg), store, p)
    }
    assert(ex.getMessage.contains("raw pipeline"))
  }

  test("label_replace: match substitutes groups, no-match leaves dst alone") {
    val q = Parser.parse(
      """{log_level="INFO"} | label_replace(svc_id, "id-$1", resource_service_name, "svc-(.*)") | label_replace(svc_id, "never", resource_service_name, "nomatch-(.*)") """).toOption.get
    val df = Compiler.rawQuery(q.raw.get, store, p.startMs, p.endMs, 100000,
      fields = Seq("resource_service_name", "svc_id"))
    assert(df.count() > 0)
    // first replace rewrote; second regex never matches so svc_id survives
    assert(df.filter(!col("svc_id").rlike("^id-\\d$")).count() == 0)
  }

  test("decolorize strips ANSI color sequences from the line") {
    import spark.implicits._
    val colored = Seq(
      (1L, 1000L, "\u001b[31mERROR\u001b[0m boom", "svc-1"),
      (2L, 2000L, "plain [5m] text", "svc-1"))
      .toDF("chq_timestamp", "chq_tsns", "log_message", "resource_service_name")
    val q = Parser.parse("""{resource_service_name="svc-1"} | decolorize""").toOption.get
    val (df, _) = Compiler.compilePipeline(q.raw.get, LogStore(colored))
    val lines = df.select("log_message").collect().map(_.getString(0)).sorted
    assert(lines.contains("ERROR boom"))
    // bare "[5m]" without the escape byte must survive
    assert(lines.contains("plain [5m] text"))
  }

  test("line_format rewrites the line for later filters") {
    val q = Parser.parse(
      """{log_level="INFO"} | logfmt | line_format "u{{.user}}:{{.evt}}" |= ":purchase" """).toOption.get
    val df = Compiler.rawQuery(q.raw.get, store, p.startMs, p.endMs, 100000)
    assert(df.count() > 0)
    assert(df.filter(!col("log_message").rlike("^u\\d+:purchase$")).count() == 0)
  }

  test("count_over_time equals bucket counts when range == step") {
    val df = Compiler.query(
      s"""sum by (attr_event_type) (count_over_time({log_level="DEBUG"}[${p.stepMs}ms]))""",
      store, p).filter(!isnan(col("value")))
    val direct = store.df
      .filter(col("log_level") === "DEBUG" &&
        col("chq_timestamp") >= p.startMs && col("chq_timestamp") < p.endMs)
      .groupBy((col("chq_timestamp") - col("chq_timestamp") % p.stepMs).as("ts"),
        col("attr_event_type"))
      .agg(count(lit(1)).cast("double").as("expected"))
    val j = df.join(direct, Seq("ts", "attr_event_type"), "full")
    assert(j.filter(col("value").isNull || col("expected").isNull ||
      col("value") =!= col("expected")).count() == 0)
  }

  test("quantile_over_time honors an outer vector aggregation") {
    val rangeMs = p.stepMs
    val inner = Compiler.query(
      s"""quantile_over_time(0.9, {log_level="INFO"} | logfmt | user > 0 | unwrap user [${rangeMs}ms])""",
      store, p).filter(!isnan(col("value")))
    val maxed = Compiler.query(
      s"""max(quantile_over_time(0.9, {log_level="INFO"} | logfmt | user > 0 | unwrap user [${rangeMs}ms]))""",
      store, p).filter(!isnan(col("value")))
    // outer max collapses the per-series quantiles to one row per ts ...
    assert(maxed.columns.toSeq == Seq("ts", "value"))
    val perTs = inner.groupBy(col("ts")).agg(max(col("value")).as("expected"))
    val j = maxed.join(perTs, "ts")
    // ... and equals the max of the inner per-series quantiles
    assert(j.filter(col("value") =!= col("expected")).count() == 0 && j.count() > 0)
  }

  test("unwrap duration converts unit strings") {
    import spark.implicits._
    val df = Seq("250ms", "1.5s", "2m", "bad", "3").toDF("took")
    val out = df.select(Compiler.durationSeconds(col("took")).as("s")).collect().map(_.get(0))
    assert(out(0) == 0.25 && out(1) == 1.5 && out(2) == 120.0)
    assert(out(3) == null && out(4) == 3.0)
  }

  test("unwrap bytes converts size strings") {
    import spark.implicits._
    val df = Seq("3MiB", "2kb", "7", "x").toDF("b")
    val out = df.select(Compiler.bytesValue(col("b")).as("v")).collect().map(_.get(0))
    assert(out(0) == 3.0 * 1024 * 1024 && out(1) == 2000.0 && out(2) == 7.0 && out(3) == null)
  }

  test("regexp group index handles unnamed and named groups") {
    val pat = "(a+)b(?P<x>c+)(?:d)(?<y>e)"
    assert(Compiler.groupIndex(pat, "x") == 2)
    assert(Compiler.groupIndex(pat, "y") == 3)
    assert(Compiler.namedGroups(pat) == Seq("x", "y"))
  }

  test("template pipe chains: trunc/substr/replace/default, quote-aware split") {
    import Parser.parseTemplate
    // quoted pipe char survives the splitter
    val t = parseTemplate("""{{.m | replace "a|b" "c" | upper}}""")
    assert(t.parts == List(PipedRef("m",
      List(("replace", List("a|b", "c")), ("upper", Nil)))), t.toString)
    // single no-arg pipe keeps the slim Ref node (back-compat)
    assert(parseTemplate("{{.m | lower}}").parts == List(Ref("m", "lower")))
    // arity errors reject at parse time
    assert(intercept[Exception](parseTemplate("{{.m | trunc}}")) != null)
    assert(intercept[Exception](parseTemplate("{{.m | substr 1}}")) != null)
    assert(intercept[Exception](parseTemplate("{{.m | trunc x}}")) != null)
  }

  test("conditional keep/drop null the label per row; unconditional reshape the set") {
    import spark.implicits._
    val rows = Seq(
      (1L, "m1", "debug", "a"), (2L, "m2", "info", "b"), (3L, "m3", "debug", "c"))
      .toDF("chq_tsns", "log_message", "level", "other")
      .withColumn("chq_timestamp", col("chq_tsns"))
      .withColumn("env", lit("prod"))
    def run(q: String, fields: Seq[String]) = {
      val e = Parser.parse(q).fold(e => fail(e), identity)
      Compiler.rawQuery(e.raw.get, LogStore(rows), 0L, 100L, 100, fields = fields)
    }
    // drop level="debug": level nulled on matching rows only
    val d = run("""{env="prod"} | drop level="debug" """, Seq("chq_tsns", "level"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(d == Map(1L -> None, 2L -> Some("info"), 3L -> None), d.toString)
    // keep level="info": label set shrinks to level, non-matching rows null
    val k = run("""{env="prod"} | keep level="info" """, Seq("chq_tsns", "level"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(k == Map(1L -> None, 2L -> Some("info"), 3L -> None), k.toString)
    // unconditional drop still removes the label from the default output
    val u = run("""{env="prod"} | drop other""", Seq("chq_tsns", "level"))
    assert(u.count() == 3)
  }

  test("vector(N) parses as a number-literal vector (reference KindVector)") {
    import spark.implicits._
    val e = Parser.parseFull("""vector(2.5) * count_over_time({env="p"}[5m])""")
      .fold(e => fail(e), identity)
    e match {
      case LogBin("*", NumberLeaf(v), _) => assert(v == 2.5)
      case other => fail(other.toString)
    }
    // standalone vector(N): constant over the step grid
    val df = Seq((1L, "x")).toDF("chq_tsns", "log_message")
      .withColumn("chq_timestamp", col("chq_tsns"))
    val p2 = graft.promql.QueryParams(0L, 3000L, 1000L)
    val out = Compiler.exprQuery(
      Parser.parseFull("vector(7)").fold(e => fail(e), identity),
      LogStore(df), p2)
    assert(out.count() == 3 &&
      out.filter(col("value") =!= 7.0).count() == 0)
  }

  test("__line__ template variable reads the current log line") {
    import spark.implicits._
    val df = Seq((1L, "hello world")).toDF("chq_tsns", "log_message")
      .withColumn("chq_timestamp", col("chq_tsns"))
      .withColumn("env", lit("prod"))
    val q = Parser.parse(
      """{env="prod"} | label_format head=`{{.__line__ | trunc 5 | upper}}`""")
      .fold(e => fail(e), identity)
    val out = Compiler.rawQuery(q.raw.get, LogStore(df), 0L, 100L, 10,
      fields = Seq("head")).head().getString(0)
    assert(out == "HELLO", out)
  }

  test("__error__ label tags parse failures without dropping lines") {
    import spark.implicits._
    val rows = Seq(
      (1L, """{"k":"v"}"""),
      (2L, "not json"),
      (3L, """key="unterminated"""),
      (4L, """key="closed" other=1"""))
    val df = rows.toDF("chq_tsns", "log_message")
      .withColumn("chq_timestamp", col("chq_tsns"))
      .withColumn("env", lit("prod"))
    def run(q: String): Set[Long] = {
      val e = Parser.parse(q).fold(e => fail(e), identity)
      Compiler.rawQuery(e.raw.get, LogStore(df), 0L, 100L, 100,
        fields = Seq("chq_tsns")).collect().map(_.getLong(0)).toSet
    }
    assert(run("""{env="prod"} | json | __error__ = ""  """) == Set(1L))
    assert(run("""{env="prod"} | json | __error__ = "JSONParserErr" """) ==
      Set(2L, 3L, 4L))
    assert(run("""{env="prod"} | logfmt | __error__ = "LogfmtParserErr" """) ==
      Set(3L))
    // unreferenced → no __error__ column, all lines flow (Loki divergence
    // documented: materialization is need-key gated)
    val e2 = Parser.parse("""{env="prod"} | json""").fold(e => fail(e), identity)
    val out = Compiler.rawQuery(e2.raw.get, LogStore(df), 0L, 100L, 100)
    assert(!out.columns.contains("__error__") && out.count() == 4)
  }

  test("pattern line filters match whole lines with <_> wildcards") {
    import spark.implicits._
    val rows = Seq(
      (1L, "GET /api/users took 15ms"),
      (2L, "GET /api/orders took 7ms"),
      (3L, "POST /api/users took 15ms"),
      (4L, "GET /api/users took 15ms EXTRA"))
    val df = rows.toDF("chq_tsns", "log_message")
      .withColumn("chq_timestamp", col("chq_tsns"))
      .withColumn("env", lit("prod"))
    def run(q: String): Set[Long] = {
      val e = Parser.parse(q).fold(e => fail(e), identity)
      Compiler.rawQuery(e.raw.get, LogStore(df), 0L, 100L, 100,
        fields = Seq("chq_tsns"))
        .collect().map(_.getLong(0)).toSet
    }
    // anchored: trailing EXTRA breaks the match unless a wildcard allows it
    assert(run("""{env="prod"} |> "GET <_> took <_>ms" """) == Set(1L, 2L))
    assert(run("""{env="prod"} |> "GET <_> took <_>" """) == Set(1L, 2L, 4L))
    assert(run("""{env="prod"} !> "<_>users<_>" """) == Set(2L))
    // named captures are the | pattern stage's job, not the filter's
    val bad = Parser.parse("""{env="prod"} |> "GET <path> took <_>" """)
      .fold(_ => None, q => Some(q))
    assert(bad.isDefined) // parses…
    intercept[IllegalArgumentException] { // …but compile rejects the capture
      Compiler.rawQuery(bad.get.raw.get, LogStore(df), 0L, 100L, 100,
        fields = Seq("chq_tsns"))
    }
  }

  test("unpack restores _entry as the line and promotes needed JSON keys") {
    import spark.implicits._
    val rows = Seq(
      (1704067200000L, """{"_entry":"real line A","svc":"api","lvl":"info"}"""),
      (1704067260000L, """{"_entry":"real line B","svc":"web","lvl":"warn"}"""),
      (1704067320000L, "not packed at all"))
    val df = rows.toDF("chq_timestamp", "log_message")
      .withColumn("chq_tsns", col("chq_timestamp") * 1000000L)
      .withColumn("env", lit("prod"))
    val q = Parser.parse("""{env="prod"} | unpack | svc = "api" """)
      .fold(e => fail(e), identity)
    val out = Compiler.rawQuery(q.raw.get, LogStore(df),
      1704067100000L, 1704068000000L, 100,
      fields = Seq("log_message", "svc"))
    val got = out.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("real line A", "api")), got.toString)
    // a non-pack line passes through unchanged when no label filter drops it
    val q2 = Parser.parse("""{env="prod"} | unpack""").fold(e => fail(e), identity)
    val lines = Compiler.rawQuery(q2.raw.get, LogStore(df),
      1704067100000L, 1704068000000L, 100, fields = Seq("log_message"))
      .collect().map(_.getString(0)).toSet
    assert(lines.contains("not packed at all"))
  }

  test("distinct keeps the first line per label combination in the window") {
    import spark.implicits._
    val rows = Seq(
      (1000L, "first a", "a"), (2000L, "second a", "a"),
      (1500L, "first b", "b"), (3000L, "second b", "b"),
      // outside the queried window: must not claim the 'c' slot
      (10L, "too early c", "c"), (2500L, "in-window c", "c"))
    val df = rows.toDF("chq_timestamp", "log_message", "attr_k")
      .withColumn("chq_tsns", col("chq_timestamp") * 1000000L)
      .withColumn("env", lit("prod"))
    val q = Parser.parse("""{env="prod"} | distinct attr_k""").fold(e => fail(e), identity)
    val out = Compiler.rawQuery(q.raw.get, LogStore(df), 500L, 5000L, 100,
      fields = Seq("log_message", "attr_k"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("first a", "a"), ("first b", "b"), ("in-window c", "c")),
      out.toString)
  }

  test("literal prefilter extraction: pattern segments and provable regex runs") {
    assert(Compiler.patternLiterals("<_> ERROR <m> took <t>ms") ==
      Seq(" ERROR ", " took ", "ms"))
    assert(Compiler.patternLiterals("plain literal") == Seq("plain literal"))
    assert(Compiler.patternLiterals("<a><b>") == Nil)
    // linear regex: longest run wins, quantified trailing char excluded
    assert(Compiler.longestRegexLiteral("error.*timeouts?") == Some("timeout"))
    assert(Compiler.longestRegexLiteral("^checkout .* failed$") == Some("checkout "))
    // unprovable shapes (alternation/groups/classes/escapes/repeats) bail
    assert(Compiler.longestRegexLiteral("abc|def").isEmpty)
    assert(Compiler.longestRegexLiteral("(abc)def").isEmpty)
    assert(Compiler.longestRegexLiteral("[ab]cdef").isEmpty)
    assert(Compiler.longestRegexLiteral("\\d+ errors").isEmpty)
    assert(Compiler.longestRegexLiteral("ab{2}cd").isEmpty)
    // too-short runs aren't worth the extra scan
    assert(Compiler.longestRegexLiteral("a.b.c").isEmpty)
  }

  test("pattern/regex filters reject adversarial long lines in linear time") {
    import spark.implicits._
    // lines that START like a match (pass the anchor + first literal) but
    // lack a later segment: exactly the shape where multi-(.*?) Java
    // backtracking goes superlinear. The contains() prefilter on the later
    // literals must reject them before the regex ever runs.
    val junk = "x" * 8192
    val rows = (1 to 2000).map(i =>
      (1000L + i, s"req $i ERROR $junk", "prod")) :+
      ((5000L, "req 0 ERROR boom took 17ms", "prod"))
    val df = rows.toDF("chq_timestamp", "log_message", "env")
      .withColumn("chq_tsns", col("chq_timestamp") * 1000000L)
    val q = Parser.parse("""{env="prod"} |> "<_> ERROR <_> took <_>ms" """)
      .fold(e => fail(e), identity)
    val t0 = System.nanoTime()
    val out = Compiler.rawQuery(q.raw.get, LogStore(df), 0L, 10000L, 10,
      fields = Seq("log_message")).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out.map(_.getString(0)).toSeq == Seq("req 0 ERROR boom took 17ms"))
    // unprefiltered backtracking takes minutes on this input; the bound is
    // deliberately loose so only the catastrophic path can trip it
    assert(sec < 20.0, f"pattern filter took $sec%.1fs — prefilter missing?")
    // the compiled plan carries the Contains guards ahead of the RLike
    // (analyzed plan: the local-relation optimizer folds the executed one)
    val plan = Compiler.rawQuery(q.raw.get, LogStore(df), 0L, 10000L, 10,
      fields = Seq("log_message")).queryExecution.analyzed.toString
    assert(plan.toLowerCase.contains("contains"), plan.take(800))
  }
}
