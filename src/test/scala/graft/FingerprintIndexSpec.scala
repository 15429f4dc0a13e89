package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ingest.{FingerprintIndex => FI, Segments}
import graft.logql.{LineFilter, LineFilterOp, LineFormatStage, LogPipeline, Template, Lit => TLit}
import graft.promql.{MatchOp, Matcher}

/** Fingerprint skip-index: lossless file pruning for needle/matcher
  * queries. The gates: pruned scans read FEWER files on selective
  * predicates, NEVER change results, and always include files the index
  * doesn't describe (post-index writes, cap-dropped trigram families).
  */
class FingerprintIndexSpec extends AnyFunSuite {
  import TestSpark._

  private val Day0 = 1704067200000L // 2024-01-01 UTC
  private def mkLogs(n: Int, tag: String) = {
    import spark.implicits._
    (0 until n).map { i =>
      val day = i % 3
      val ts = Day0 + day * 86400000L + (i.toLong * 7919) % 86400000L
      val needle = if (day == 1 && i % 5 == 0) " needle=zebraquux" else ""
      val svc = if (day == 2 && i % 11 == 0) "rare-svc" else s"svc-${i % 3}"
      (ts, ts * 1000000L, s"evt=$tag user=$i$needle", svc, 0L,
        if (i % 4 == 0) "ERROR" else "INFO")
    }.toDF("chq_timestamp", "chq_tsns", "log_message",
      "resource_service_name", "chq_fingerprint", "log_level")
  }

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_fpidx_").toString

  private def files(dir: String): Set[String] =
    spark.read.parquet(dir).inputFiles.map(FI.normPath).toSet

  test("hash48 driver-side matches the Column twin bit-for-bit") {
    import spark.implicits._
    val samples = Seq("log_message:abc", "f:.*", "x:ü¢∆", "resource_service_name:svc-1")
    val fromCols = samples.toDF("s")
      .select(conv(substring(md5(col("s")), 1, 12), 16, 10).cast("long"))
      .collect().map(_.getLong(0)).toSeq
    assert(fromCols == samples.map(FI.hash48))
  }

  test("needle line-filter prunes to the needle's day; results unchanged") {
    val dir = freshDir()
    Segments.writeLogSegments(mkLogs(3000, "a"), dir, maxRecordsPerFile = 400)
    FI.buildLogIndex(spark, dir)
    val pipe = LogPipeline(Nil, List(LineFilter(LineFilterOp.Contains, "zebraquux")))
    val pruned = FI.scanLogs(spark, dir, pipe)
    val all = files(dir)
    val read = pruned.inputFiles.map(FI.normPath).toSet
    assert(read.nonEmpty && read.size < all.size, s"no pruning: ${read.size}/${all.size}")
    assert(read.forall(_.contains("dateint=20240102")), "pruned scan kept a needle-free day")
    val expect = spark.read.parquet(dir)
      .filter(col("log_message").contains("zebraquux")).count()
    assert(pruned.filter(col("log_message").contains("zebraquux")).count() == expect)
  }

  test("exact matcher on an indexed dimension prunes; regex-only does not") {
    val dir = freshDir()
    Segments.writeLogSegments(mkLogs(3000, "b"), dir, maxRecordsPerFile = 400)
    FI.buildLogIndex(spark, dir)
    val eq = LogPipeline(List(Matcher("resource_service_name", MatchOp.Eq, "rare-svc")), Nil)
    val prunedEq = FI.scanLogs(spark, dir, eq).inputFiles.map(FI.normPath).toSet
    val all = files(dir)
    assert(prunedEq.nonEmpty && prunedEq.size < all.size)
    assert(prunedEq.forall(_.contains("dateint=20240103")))
    // regex with a literal run prunes through the trigram family
    val re = LogPipeline(List(Matcher("resource_service_name", MatchOp.Re, "rare-.*")), Nil)
    val prunedRe = FI.scanLogs(spark, dir, re).inputFiles.map(FI.normPath).toSet
    assert(prunedRe.nonEmpty && prunedRe.size < all.size)
    assert(prunedRe.forall(_.contains("dateint=20240103")))
    // run-free regex contributes no requirement → full scan (conservative)
    val opaque = LogPipeline(List(Matcher("resource_service_name", MatchOp.Re, ".*")), Nil)
    assert(FI.scanLogs(spark, dir, opaque).inputFiles.map(FI.normPath).toSet == all)
  }

  test("alternation matcher prunes via an OR-set of exact fingerprints") {
    val dir = freshDir()
    Segments.writeLogSegments(mkLogs(3000, "h"), dir, maxRecordsPerFile = 400)
    FI.buildLogIndex(spark, dir)
    // one alternate present only on day 3, the other present nowhere: a
    // file survives iff it can satisfy EITHER alternate
    val alt = LogPipeline(List(
      Matcher("resource_service_name", MatchOp.Re, "rare-svc|absent-svc")), Nil)
    val pruned = FI.scanLogs(spark, dir, alt)
    val read = pruned.inputFiles.map(FI.normPath).toSet
    assert(read.nonEmpty && read.size < files(dir).size)
    assert(read.forall(_.contains("dateint=20240103")))
    // results equal the full scan under the same predicate
    val expect = spark.read.parquet(dir)
      .filter(col("resource_service_name").rlike("^(?:rare-svc|absent-svc)$")).count()
    assert(pruned.filter(col("resource_service_name")
      .rlike("^(?:rare-svc|absent-svc)$")).count() == expect && expect > 0)
  }

  test("a 5000-wide OR-set plans log-depth: no planner stack overflow, " +
      "pruning still exact (r17 sf1 find)") {
    // the r17 sf1 sweep crashed it_exemplar_trace before any data was
    // touched: canMatchCol left-folded a ~1100-id trace OR-set into a
    // ~1100-deep Column chain and the Column→Expression converter
    // StackOverflowed. A real exemplar pivot at lake scale carries
    // thousands of ids; the balanced fold keeps depth at log₂(N).
    val dir = freshDir()
    Segments.writeLogSegments(mkLogs(3000, "w"), dir, maxRecordsPerFile = 400)
    FI.buildLogIndex(spark, dir)
    // 4999 absent values + the one rare service: the OR-set must still
    // prune to the rare service's day and keep its files
    val ids = (0 until 4999).map(i => s"no-such-svc-$i") :+ "rare-svc"
    val req = FI.ReqOr(ids.map(t => FI.Requirement("resource_service_name",
      Seq(FI.existsFp("resource_service_name"),
        FI.fingerprint("resource_service_name", t)), guarded = false)))
    val excluded = FI.excludedForTrees(spark, dir, Seq(req))
    val pruned = FI.prunedRead(spark, dir, excluded)
    val read = pruned.inputFiles.map(FI.normPath).toSet
    assert(read.nonEmpty && read.size < files(dir).size)
    assert(read.forall(_.contains("dateint=20240103")), read.take(3))
    val expect = spark.read.parquet(dir)
      .filter(col("resource_service_name") === "rare-svc").count()
    assert(pruned.filter(col("resource_service_name") === "rare-svc")
      .count() == expect && expect > 0)
  }

  test("regex line filter prunes through body literal runs") {
    val dir = freshDir()
    Segments.writeLogSegments(mkLogs(3000, "i"), dir, maxRecordsPerFile = 400)
    FI.buildLogIndex(spark, dir)
    val pipe = LogPipeline(Nil,
      List(LineFilter(LineFilterOp.Regex, "needle=zebra[a-z]+")))
    val pruned = FI.scanLogs(spark, dir, pipe)
    val read = pruned.inputFiles.map(FI.normPath).toSet
    assert(read.nonEmpty && read.size < files(dir).size)
    assert(read.forall(_.contains("dateint=20240102")))
    val expect = spark.read.parquet(dir)
      .filter(col("log_message").rlike("needle=zebra[a-z]+")).count()
    assert(pruned.filter(col("log_message").rlike("needle=zebra[a-z]+"))
      .count() == expect && expect > 0)
  }

  test("pre-parser label filters prune like matchers; post-parser ones never do") {
    import graft.logql.{JsonStage, LabelFilter}
    val dir = freshDir()
    Segments.writeLogSegments(mkLogs(3000, "j"), dir, maxRecordsPerFile = 400)
    FI.buildLogIndex(spark, dir)
    val pre = LogPipeline(Nil,
      List(LabelFilter("resource_service_name", "=", "rare-svc", numeric = false)))
    val read = FI.scanLogs(spark, dir, pre).inputFiles.map(FI.normPath).toSet
    assert(read.nonEmpty && read.size < files(dir).size)
    assert(read.forall(_.contains("dateint=20240103")))
    // the same filter AFTER a parser stage references a parsed label the
    // index never saw → no requirement from it
    val post = LogPipeline(Nil, List(JsonStage(Nil),
      LabelFilter("resource_service_name", "=", "rare-svc", numeric = false)))
    assert(FI.wantedFps(FI.requirementTreeFor(post)).isEmpty)
  }

  test("exact alternates: literals in, metacharacters and empties out") {
    assert(FI.exactAlternates("a|b|c").contains(Seq("a", "b", "c")))
    assert(FI.exactAlternates("^(?:api|web)$").contains(Seq("api", "web")))
    assert(FI.exactAlternates("^(api|web)$").contains(Seq("api", "web")))
    assert(FI.exactAlternates("^api$").contains(Seq("api")))
    assert(FI.exactAlternates("""a\.b|c""").contains(Seq("a.b", "c")))
    assert(FI.exactAlternates("a|b.*").isEmpty)       // live metachar
    assert(FI.exactAlternates("a|(b|c)").isEmpty)     // nested group
    assert(FI.exactAlternates("""a|\db""").isEmpty)   // class escape
    // empty alternate extracts but regexRequirement must refuse it (the
    // pattern matches "", so the label may be ABSENT — any requirement
    // would over-prune)
    assert(FI.exactAlternates("a|").contains(Seq("a", "")))
    assert(FI.regexRequirement("resource_service_name", "a|").isEmpty)
  }

  test("literal runs: optionality, classes, and alternation never over-claim") {
    assert(FI.literalRuns("deadbeef") == Seq("deadbeef"))
    assert(FI.literalRuns(".*deadbeef.*cafe[0-9]+x") == Seq("deadbeef", "cafe"))
    assert(FI.literalRuns("dead?beef") == Seq("dea", "beef")) // 'd' optional
    assert(FI.literalRuns("abc{2}def") == Seq("def"))         // 'c' count unknown
    assert(FI.literalRuns("(abc)?required") == Seq("required"))
    assert(FI.literalRuns("""\d+foobar""") == Seq("foobar"))
    assert(FI.literalRuns("""foo\.bar""") == Seq("foo.bar"))
    assert(FI.literalRuns("a|b") == Nil)                      // alternation voids all
    assert(FI.literalRuns("abcdef|ghijkl") == Nil)
    assert(FI.literalRuns(".*") == Nil)
    assert(FI.literalRuns("ab+cde") == Seq("cde"))            // run ends at +
    assert(FI.literalRuns("abc(") == Nil)                     // malformed: no claims
  }

  test("a multi-leaf expression costs exactly ONE index read") {
    import graft.api.LogSegments
    import graft.promql.QueryParams
    val dir = freshDir()
    Segments.writeLogSegments(mkLogs(3000, "k"), dir, maxRecordsPerFile = 400)
    FI.buildLogIndex(spark, dir)
    val p = QueryParams(Day0, Day0 + 4 * 86400000L, 3600000L)
    val e = graft.logql.Parser.parseFull(
      s"""sum(count_over_time({log_level="ERROR"} |= "zebraquux" [1h])) /
          sum(count_over_time({log_level="ERROR"} |= "needle" [1h]))""").toOption.get
    val before = FI.indexReads.get()
    LogSegments.scanFor(spark, dir, e, p)
    assert(FI.indexReads.get() - before == 1,
      s"expected 1 index read for a 2-leaf expression, got ${FI.indexReads.get() - before}")
  }

  test("files written after the index build always scan (lossless on staleness)") {
    val dir = freshDir()
    Segments.writeLogSegments(mkLogs(1500, "c"), dir, maxRecordsPerFile = 400)
    FI.buildLogIndex(spark, dir)
    // second wave carries the needle on a NEW day the index knows nothing about
    import spark.implicits._
    val late = Seq((Day0 + 5 * 86400000L, (Day0 + 5 * 86400000L) * 1000000L,
      "evt=c late needle=zebraquux", "svc-9", 0L, "INFO"))
      .toDF("chq_timestamp", "chq_tsns", "log_message",
        "resource_service_name", "chq_fingerprint", "log_level")
    Segments.writeLogSegments(late, dir, maxRecordsPerFile = 400)
    val pipe = LogPipeline(Nil, List(LineFilter(LineFilterOp.Contains, "zebraquux")))
    val got = FI.scanLogs(spark, dir, pipe)
      .filter(col("log_message").contains("zebraquux")).count()
    val expect = spark.read.parquet(dir)
      .filter(col("log_message").contains("zebraquux")).count()
    assert(got == expect, "stale index dropped rows from unindexed files")
  }

  test("incremental indexing covers only new files, then prunes with them") {
    val dir = freshDir()
    Segments.writeLogSegments(mkLogs(1500, "g"), dir, maxRecordsPerFile = 400)
    FI.buildLogIndex(spark, dir)
    val firstWave = files(dir).size
    // second wave lands on a new day; index it incrementally
    import spark.implicits._
    val late = Seq((Day0 + 6 * 86400000L, (Day0 + 6 * 86400000L) * 1000000L,
      "evt=g late needle=quuxzebra", "svc-9", 0L, "INFO"))
      .toDF("chq_timestamp", "chq_tsns", "log_message",
        "resource_service_name", "chq_fingerprint", "log_level")
    Segments.writeLogSegments(late, dir, maxRecordsPerFile = 400)
    val indexedNow = FI.indexNewFiles(spark, dir)
    assert(indexedNow == files(dir).size - firstWave && indexedNow > 0)
    assert(FI.indexNewFiles(spark, dir) == 0L) // idempotent
    // with the new files indexed, the late needle prunes to its one file
    val pipe = LogPipeline(Nil, List(LineFilter(LineFilterOp.Contains, "quuxzebra")))
    val read = FI.scanLogs(spark, dir, pipe).inputFiles.map(FI.normPath).toSet
    assert(read.size < files(dir).size)
    assert(read.forall(_.contains("dateint=20240107")))
  }

  test("index compaction: micro-batch shards collapse to one file, stale rows drop, pruning unchanged") {
    val dir = freshDir()
    Segments.writeLogSegments(mkLogs(1500, "h"), dir, maxRecordsPerFile = 400)
    FI.buildLogIndex(spark, dir)
    // three incremental waves — each appends one index parquet batch,
    // the streaming micro-batch small-files decay
    import spark.implicits._
    (1 to 3).foreach { k =>
      val ts = Day0 + (5L + k) * 86400000L
      val late = Seq((ts, ts * 1000000L, s"evt=h wave$k plainline",
        "svc-9", 0L, "INFO"))
        .toDF("chq_timestamp", "chq_tsns", "log_message",
          "resource_service_name", "chq_fingerprint", "log_level")
      Segments.writeLogSegments(late, dir, maxRecordsPerFile = 400)
      assert(FI.indexNewFiles(spark, dir) > 0)
    }
    def idxFiles(): Int = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(FI.indexPath(dir)))
      try st.filter(p => p.toString.endsWith(".parquet")).count().toInt
      finally st.close()
    }
    assert(idxFiles() >= 4, s"expected build+3 append shards, got ${idxFiles()}")
    // retention drops day 0 — its index rows go stale (harmless, scanned)
    assert(Segments.expireSegments(spark, dir, 20240102) == 1)
    val pipe = LogPipeline(Nil, List(LineFilter(LineFilterOp.Contains, "zebraquux")))
    def needleScan() = FI.scanLogs(spark, dir, pipe)
    val prunedBefore = needleScan().inputFiles.map(FI.normPath).toSet
    val needleRows = needleScan()
      .filter(col("log_message").contains("zebraquux")).count()
    assert(needleRows > 0 && prunedBefore.nonEmpty)
    val dropped = FI.compactIndex(spark, dir)
    assert(dropped > 0, "the expired day should have left stale index rows")
    assert(idxFiles() == 1, s"expected ONE compacted index file, got ${idxFiles()}")
    // the index now describes live files only
    val orphans = spark.read.parquet(FI.indexPath(dir))
      .join(files(dir).toSeq.toDF("file"), Seq("file"), "left_anti").count()
    assert(orphans == 0, s"$orphans index rows for files no longer present")
    // pruning decision and results are unchanged by the rewrite
    assert(needleScan().inputFiles.map(FI.normPath).toSet == prunedBefore)
    assert(needleScan().filter(col("log_message").contains("zebraquux")).count()
      == needleRows)
    // nothing left to drop; the layout stays compact
    assert(FI.compactIndex(spark, dir) == 0L && idxFiles() == 1)
  }

  test("trigram cap drops the body family (no pruning) but stays correct") {
    val dir = freshDir()
    Segments.writeLogSegments(mkLogs(1500, "d"), dir, maxRecordsPerFile = 400)
    FI.buildLogIndex(spark, dir, maxTrigramsPerFile = 1)
    val pipe = LogPipeline(Nil, List(LineFilter(LineFilterOp.Contains, "zebraquux")))
    // every file over the cap → guarded requirement can't exclude anything
    assert(FI.scanLogs(spark, dir, pipe).inputFiles.map(FI.normPath).toSet == files(dir))
  }

  test("LogSegments front door: parse → prune → evaluate matches the full scan") {
    import graft.api.LogSegments
    import graft.promql.QueryParams
    val dir = freshDir()
    Segments.writeLogSegments(mkLogs(3000, "e"), dir, maxRecordsPerFile = 400)
    FI.buildLogIndex(spark, dir)
    val p = QueryParams(Day0, Day0 + 4 * 86400000L, 3600000L)
    // raw needle query prunes to the needle's day, same rows as full scan
    val q = """{log_level="INFO"} |= "zebraquux""""
    val e = graft.logql.Parser.parseFull(q).toOption.get
    val scan = LogSegments.scanFor(spark, dir, e, p)
    assert(scan.inputFiles.map(FI.normPath).toSet.size < files(dir).size)
    val got = LogSegments.query(spark, dir, q, p, limit = 100000)
    val full = spark.read.parquet(dir)
      .filter(col("log_level") === "INFO" && col("log_message").contains("zebraquux") &&
        col("chq_timestamp") >= p.startMs && col("chq_timestamp") < p.endMs)
    assert(got.count() == full.count() && got.count() > 0)
    // aggregated query rides the same pruned store and the PromQL engine
    val agg = LogSegments.query(spark, dir,
      s"""sum(count_over_time({log_level="INFO"} |= "zebraquux" [${p.stepMs}ms]))""", p)
    val total = agg.agg(sum(col("value"))).head().getDouble(0)
    assert(total == full.count().toDouble)
  }

  test("binop pruning is per-leaf: a file needed by any leaf is read") {
    import graft.api.LogSegments
    import graft.promql.QueryParams
    val dir = freshDir()
    Segments.writeLogSegments(mkLogs(3000, "f"), dir, maxRecordsPerFile = 400)
    FI.buildLogIndex(spark, dir)
    val p = QueryParams(Day0, Day0 + 4 * 86400000L, 3600000L)
    // leaf A (needle) would prune to one day, leaf B (no needle) needs all
    // files → the expression scan must keep every file
    val e = graft.logql.Parser.parseFull(
      s"""sum(count_over_time({log_level="INFO"} |= "zebraquux" [1h])) /
          sum(count_over_time({log_level="INFO"}[1h]))""").toOption.get
    val scan = LogSegments.scanFor(spark, dir, e, p)
    assert(scan.inputFiles.map(FI.normPath).toSet == files(dir))
  }

  test("line filters after line_format contribute no requirement") {
    val pre = LineFilter(LineFilterOp.Contains, "before")
    val post = LineFilter(LineFilterOp.Contains, "after")
    val pipe = LogPipeline(Nil, List(pre, LineFormatStage(Template(List(TLit("x")))), post))
    val reqs = FI.requirementsFor(pipe)
    assert(reqs.size == 1)
    assert(reqs.head.fps == FI.trigrams("before").toSeq.sorted.map(t => FI.fingerprint("log_message", t)))
  }

  test("empty-value matcher (label absent semantics) never prunes") {
    val pipe = LogPipeline(List(Matcher("resource_service_name", MatchOp.Eq, "")), Nil)
    assert(FI.requirementsFor(pipe).isEmpty)
  }

  test("exclusion crosses the driver boundary as file paths ONLY") {
    // the 100 TB gate: tree evaluation happens in the executors over the
    // per-file hit arrays; the driver sees a single-column `file` frame —
    // never per-file fingerprint sets (r6 watch item)
    val dir = freshDir()
    Segments.writeLogSegments(mkLogs(600, "x"), dir, maxRecordsPerFile = 200)
    FI.buildLogIndex(spark, dir)
    val pipe = LogPipeline(
      List(Matcher("log_level", MatchOp.Eq, "ERROR")),
      List(LineFilter(LineFilterOp.Contains, "zebraquux")))
    val frame = FI.exclusionFrame(spark, dir,
      Seq(FI.requirementTreeFor(pipe)))
    assert(frame.isDefined)
    assert(frame.get.schema.fieldNames.toSeq == Seq("file"),
      frame.get.schema.treeString)
  }

  test("Column tree evaluation is equivalent to the driver-side canMatch") {
    import spark.implicits._
    // random-ish trees + hit sets: the distributed evaluation must agree
    // with the reference implementation on every (tree, have) combination
    val fpsA = Seq(1L, 2L, 3L)
    val trees: Seq[FI.ReqNode] = Seq(
      FI.Requirement("f", fpsA, guarded = false),
      FI.Requirement("f", fpsA, guarded = true),
      FI.ReqAnd(Seq(
        FI.Requirement("a", Seq(1L), guarded = false),
        FI.ReqOr(Seq(
          FI.Requirement("b", Seq(2L), guarded = true),
          FI.Requirement("c", Seq(9L), guarded = false))))),
      FI.ReqOr(Nil), FI.ReqAnd(Nil))
    val universe = Seq(1L, 2L, 3L, 9L,
      FI.sentinelFp("f"), FI.sentinelFp("b"), FI.sentinelFp("c"))
    // all subsets of a 7-element universe = 128 hit sets
    val haves = (0 until 128).map(m =>
      universe.zipWithIndex.collect { case (v, i) if (m & (1 << i)) != 0 => v })
    val df = haves.zipWithIndex.map { case (h, i) => (i, h) }.toDF("i", "fps")
    trees.foreach { t =>
      val c = FI.canMatchCol(df("fps"), t)
      val got = df.select(df("i"), c.as("m")).collect()
        .map(r => r.getInt(0) -> r.getBoolean(1)).toMap
      haves.zipWithIndex.foreach { case (h, i) =>
        assert(got(i) == FI.canMatch(h.toSet, t),
          s"tree $t, have ${h.toSet}")
      }
    }
  }
}
