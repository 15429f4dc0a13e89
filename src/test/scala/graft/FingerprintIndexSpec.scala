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
    // regex matchers contribute no requirement → full scan (conservative)
    val re = LogPipeline(List(Matcher("resource_service_name", MatchOp.Re, "rare-.*")), Nil)
    assert(FI.scanLogs(spark, dir, re).inputFiles.map(FI.normPath).toSet == all)
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
}
