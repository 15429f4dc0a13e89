package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.api.Discovery

/** Discovery endpoints: the tag-name unpivot must survive hostile label
  * names (OTel attribute names are user-controlled and may hold backticks,
  * quotes, or dots), which rules out any string-assembled SQL in the path.
  */
class DiscoverySpec extends AnyFunSuite {
  import TestSpark._

  test("tagNames counts non-empty labels and survives hostile column names") {
    import spark.implicits._
    val df = Seq(
      (1000L, "a", "x", ""),
      (2000L, "b", null, "v"),
      (3000L, "c", "y", "w"))
      .toDF("chq_timestamp", "attr_plain", "attr_a`b", "attr_q'c\"d")
    val out = Discovery.tagNames(df, Seq("attr_plain", "attr_a`b", "attr_q'c\"d"), 0L, 10000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("attr_plain" -> 3L, "attr_a`b" -> 2L, "attr_q'c\"d" -> 2L))
  }

  test("tagValues and series survive hostile column names") {
    import spark.implicits._
    val df = Seq(
      (1000L, "x", "A"),
      (2000L, "x", "B"),
      (3000L, "y", "A"))
      .toDF("chq_timestamp", "attr_a`b", "attr_q'c")
    val tv = Discovery.tagValues(df, "attr_a`b", 0L, 10000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tv == Map("x" -> 2L, "y" -> 1L))
    val se = Discovery.series(df, Seq("attr_a`b", "attr_q'c"), 0L, 10000L,
      matchers = List(graft.promql.Matcher("attr_q'c", graft.promql.MatchOp.Eq, "A")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(se == Set(("x", "A", 1L), ("y", "A", 1L)))
  }

  test("discovery over a multi-tier lake: the coarsest tier alone yields " +
      "the full tag universe (HTTP scan reads ~1/Nth of the rows)") {
    import spark.implicits._
    // the rollup chain carries every TID — the full label set — into
    // every coarser tier, so discovery answers are tier-invariant; the
    // HTTP segScan exploits that by reading ONLY the coarsest tier.
    // Build a two-tier dir and pin: (a) coarse-tier tag values == the
    // all-tier value SET, (b) the HTTP tags/tagvalues routes answer
    // identically to the full-scan Discovery call.
    val day0 = 1704067200000L
    val ev = (0 until 2000).map { i =>
      (day0 + (i.toLong * 97000) % (2L * 86400000L), "m_disc",
        s"svc-${i % 7}", (i % 30).toDouble)
    }.toDF("ts_ms", "name", "attr_svc", "v")
    val base = graft.ingest.MetricsPreAgg.preAggregate(
      ev, col("ts_ms"), col("name"), col("v"),
      Seq("attr_svc" -> col("attr_svc")), freqMs = 10000L, withSketch = false)
    val dir = java.nio.file.Files.createTempDirectory("graft_disc_tiers_").toString
    graft.ingest.Segments.writeMetricSegments(base, dir)
    graft.ingest.Segments.writeMetricSegments(
      graft.ingest.MetricsPreAgg.rollup(base, 3600000L), dir)

    val all = spark.read.parquet(dir)
    val coarse = all.filter(col("freq") === 3600000L)
    def values(df: org.apache.spark.sql.DataFrame): Set[String] =
      Discovery.tagValues(df, "attr_svc", day0, day0 + 3L * 86400000L)
        .collect().map(_.getString(0)).toSet
    assert(values(coarse) == values(all) && values(all).size == 7)

    val api = new graft.api.HttpApi(spark, metricsDir = Some(dir)).start()
    try {
      val uri = java.net.URI.create(
        s"http://127.0.0.1:${api.port}/api/v1/metrics/tagvalues?tag=attr_svc" +
          s"&s=$day0&e=${day0 + 3L * 86400000L}")
      val body = new String(uri.toURL.openStream().readAllBytes(), "UTF-8")
      (0 until 7).foreach(k => assert(body.contains(s"svc-$k"), body.take(300)))
    } finally api.stop()
  }

  test("discovery freshness: a label living only in a not-yet-rolled-up " +
      "day is visible through the HTTP routes (r16 VERDICT #2)") {
    import spark.implicits._
    // day 0: rolled (10s + 1h tiers), services svc-0..svc-2.
    // day 1: FRESH — only the 10s tier exists (the rollup job hasn't
    // run), and it carries a brand-new service. The old dir-wide
    // coarsest-tier pin made svc-fresh invisible to tags/tagvalues/
    // series until the rollup landed; the per-dateint plan reads day 1
    // from the finest tier it HAS.
    val day0 = 1704067200000L
    val day1 = day0 + 86400000L
    val ev = ((0 until 600).map { i =>
      (day0 + i * 144000L, s"svc-${i % 3}", (i % 9).toDouble)
    } ++ (0 until 200).map { i =>
      (day1 + i * 144000L, "svc-fresh", i.toDouble)
    }).toDF("ts_ms", "attr_svc", "v")
    val base = graft.ingest.MetricsPreAgg.preAggregate(
      ev, col("ts_ms"), lit("m_disc"), col("v"),
      Seq("attr_svc" -> col("attr_svc")), freqMs = 10000L, withSketch = false)
    val dir = java.nio.file.Files.createTempDirectory("graft_disc_fresh_").toString
    graft.ingest.Segments.writeMetricSegments(base, dir)
    graft.ingest.Segments.writeMetricSegments(
      graft.ingest.MetricsPreAgg.rollup(
        base.filter(col("chq_timestamp") < day1), 3600000L), dir)

    val api = new graft.api.HttpApi(spark, metricsDir = Some(dir)).start()
    try {
      val base_ = s"http://127.0.0.1:${api.port}"
      def body(path: String): String = {
        val uri = java.net.URI.create(base_ + path)
        new String(uri.toURL.openStream().readAllBytes(), "UTF-8")
      }
      val win = s"s=$day0&e=${day1 + 86400000L}"
      val tv = body(s"/api/v1/metrics/tagvalues?tag=attr_svc&$win")
      assert(tv.contains("svc-fresh"), tv.take(400))
      (0 until 3).foreach(k => assert(tv.contains(s"svc-$k"), tv.take(400)))
      assert(body(s"/api/v1/metrics/tags?$win").contains("attr_svc"))
      // rolled day still reads the COARSE tier: svc-0's count must be its
      // hourly-rollup row count (24h/3600s × its share), not the 10s
      // tier's — per-dateint selection keeps the cheap path cheap and
      // never double-counts a day present in both tiers
      val coarseN = spark.read.parquet(dir)
        .filter(col("freq") === 3600000L && col("attr_svc") === "svc-0").count()
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val rows = om.readTree(tv).get("results")
      val nOf = (0 until rows.size).map(rows.get)
        .find(_.get("tag_value").asText == "svc-0").get.get("n").asLong
      assert(nOf == coarseN, s"svc-0 n=$nOf, coarse rows=$coarseN")
    } finally api.stop()
  }

  test("exotic multi-tier layout (freq without dateint): discovery pins " +
      "the coarsest tier via the distinct-freq probe — no per-tier " +
      "double counting (r17 ADVICE #4)") {
    import spark.implicits._
    // a layout tierPartitions' two globs cannot see: freq= at the top,
    // NO dateint key. The old behavior scanned every tier unfiltered and
    // double-counted each series per tier.
    val day0 = 1704067200000L
    val rows = (0 until 240).map(i =>
      (day0 + i * 600000L, "m_x", s"svc-${i % 3}", 1.0, 10000L)) ++
      (0 until 4).map(i =>
        (day0 + i * 3600000L, "m_x", s"svc-${i % 3}", 60.0, 3600000L))
    val df = rows.toDF("chq_timestamp", "metric_name", "attr_svc", "chq_rollup_sum", "f")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_disc_exotic_").toString
    df.withColumn("freq", col("f")).drop("f")
      .write.mode("overwrite").partitionBy("freq").parquet(dir)
    val (scan, plan) = Discovery.segmentScanWithPlan(spark, dir, day0,
      day0 + 86400000L)
    // pinned to the coarsest tier: exactly the 4 hourly rows survive
    assert(scan.count() == 4, s"got ${scan.count()} rows")
    assert(plan.exists(_.pinned.contains(3600000L)), s"plan=$plan")
    val tv = Discovery.tagValues(scan, "attr_svc", day0, day0 + 86400000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tv.values.sum == 4, s"tv=$tv")
  }

  test("tagNames drops all-empty labels and applies the time bound") {
    import spark.implicits._
    val df = Seq((1000L, "a", ""), (99999L, "b", "late"))
      .toDF("chq_timestamp", "attr_keep", "attr_empty")
    val out = Discovery.tagNames(df, Seq("attr_keep", "attr_empty"), 0L, 10000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // attr_empty is non-empty only outside the window → filtered out
    assert(out == Map("attr_keep" -> 1L))
  }
}
