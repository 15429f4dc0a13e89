package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.api.AggFiles
import graft.ingest.Segments
import graft.promql.{MatchOp, Matcher}

/** Agg-file substitution: gating (flag off / field subset) and the
  * equivalence contract — the rewrite must return exactly what the raw
  * segment scan returns.
  */
class AggFilesSpec extends AnyFunSuite {
  import TestSpark._

  private val Day0 = 1704067200000L

  private lazy val segDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_aggf_").toString
    val logs = (0 until 4000).map { i =>
      val ts = Day0 + (i % 2) * 86400000L + (i.toLong * 6151) % 86400000L
      (ts, ts * 1000000L, s"evt user=$i", s"svc-${i % 3}", 0L,
        if (i % 4 == 0) "ERROR" else "INFO")
    }.toDF("chq_timestamp", "chq_tsns", "log_message",
      "resource_service_name", "chq_fingerprint", "log_level")
    Segments.writeLogSegments(logs, dir, maxRecordsPerFile = 1000)
    AggFiles.writeLogAggFile(spark, dir, Seq("log_level", "resource_service_name"))
    dir
  }

  test("canUse: flag off rejects; subset accepted; non-subset rejected") {
    val fields = Seq("log_level", "resource_service_name")
    assert(!AggFiles.canUse(spark, fields, Seq("resource_service_name"), Seq("log_level")))
    spark.conf.set(AggFiles.FlagKey, "true")
    try {
      assert(AggFiles.canUse(spark, fields, Seq("resource_service_name"), Seq("log_level")))
      assert(!AggFiles.canUse(spark, fields, Seq("attr_event_type"), Nil))
      assert(!AggFiles.canUse(spark, Nil, Nil, Nil))
    } finally spark.conf.unset(AggFiles.FlagKey)
  }

  test("agg-file counts == raw-segment counts (flag-on equals flag-off)") {
    val matchers = List(Matcher("log_level", MatchOp.Eq, "ERROR"))
    val groupBy = Seq("resource_service_name")
    val step = 3600000L
    val fromAgg = AggFiles.countsFromAggFile(spark, segDir,
      Seq("log_level", "resource_service_name"), step, Day0, Day0 + 3 * 86400000L,
      matchers, groupBy).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val fromRaw = AggFiles.countsFromRaw(spark, segDir, step, Day0,
      Day0 + 3 * 86400000L, matchers, groupBy).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(fromAgg.nonEmpty && fromAgg == fromRaw)
    // the rewrite's whole point: materialized input is much smaller
    assert(AggFiles.dirBytes(spark,
      AggFiles.aggDir(segDir, Seq("log_level", "resource_service_name"))) <
      AggFiles.dirBytes(spark, segDir))
  }
}
