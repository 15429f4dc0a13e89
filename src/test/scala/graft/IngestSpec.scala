package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ingest.{Flatten, MetricsPreAgg, Segments}

class IngestSpec extends AnyFunSuite {
  import TestSpark._

  test("flatten normalizes names, prefixes, stringifies") {
    import spark.implicits._
    val df = Seq((1L, "GET", 200)).toDF("id", "Http.Method", "code")
      .select($"id", struct(struct($"`Http.Method`".as("http.method"),
        $"code".as("Status-Code")).as("attributes")).as("resource"))
    val out = Flatten.flattenToCooked(df,
      prefixes = Map("resource" -> "resource_"), keepTyped = Set("id"))
    assert(out.columns.toSet ==
      Set("id", "resource_attributes_http_method", "resource_attributes_status_code"))
    val r = out.head()
    assert(r.getAs[String]("resource_attributes_http_method") == "GET")
    assert(r.getAs[String]("resource_attributes_status_code") == "200") // stringified
  }

  test("rollup chain preserves sums/counts and min/max at every tier") {
    val ev = graft.model.Tables.events(spark, sf)
    val base = MetricsPreAgg.preAggregate(ev, col("ts_ms"), lit("m"), col("value"),
      Seq("attr_event_type" -> col("event_type")), freqMs = 10000L, withSketch = true)
    val tiers = MetricsPreAgg.rollupChain(base)
    val expected = ev.agg(sum("value"), count(lit(1)), min("value"), max("value")).head()
    for (f <- MetricsPreAgg.RollupChainMs) {
      val t = tiers(f).agg(
        sum("chq_rollup_sum"), sum("chq_rollup_count"),
        min("chq_rollup_min"), max("chq_rollup_max")).head()
      assert(math.abs(t.getDouble(0) - expected.getDouble(0)) < 1e-6, s"freq=$f sum")
      assert(t.getDouble(1).toLong == expected.getLong(1), s"freq=$f count")
      assert(t.getDouble(2) == expected.getDouble(2) && t.getDouble(3) == expected.getDouble(3))
    }
    // sketch survives the chain: hourly p50 within alpha of exact
    import graft.sketch.{functions => gf}
    val hourly = tiers(3600000L)
    val merged = hourly.agg(gf.ddsketch_merge_agg(col("chq_sketch")).as("sk"))
      .select(gf.ddsketch_quantile(col("sk"), 0.5)).head().getDouble(0)
    val exact = ev.stat.approxQuantile("value", Array(0.5), 0.0)(0)
    assert(math.abs(merged - exact) / exact < 0.05, s"p50 sketch=$merged exact=$exact")
  }

  test("segment writer produces dateint/freq partitions with sorted files") {
    val ev = graft.model.Tables.events(spark, sf)
    val base = MetricsPreAgg.preAggregate(ev, col("ts_ms"), lit("m"), col("value"),
      Seq("attr_event_type" -> col("event_type")), freqMs = 60000L, withSketch = false)
    val dir = Files.createTempDirectory("graft_segtest_").toString
    Segments.writeMetricSegments(base, dir)
    val files = new java.io.File(dir).listFiles()
    assert(files.exists(_.getName.startsWith("dateint=")))
    // per-file sortedness: rows within each parquet file are sorted by
    // (metric_name, chq_tid, chq_timestamp)
    val withFile = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .withColumn("key", concat_ws("|", col("metric_name"),
        format_string("%020d", col("chq_tid")), format_string("%020d", col("chq_timestamp"))))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("f"))
      .orderBy(monotonically_increasing_id())
    val unsorted = withFile
      .withColumn("prev", lag(col("key"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") > col("key"))
      .count()
    assert(unsorted == 0)
  }

  test("rollup re-extracts percentiles from merged sketches at every tier") {
    import graft.sketch.{functions => gf}
    val ev = graft.model.Tables.events(spark, sf)
    val base = MetricsPreAgg.preAggregate(ev, col("ts_ms"), lit("m"), col("value"),
      Seq("attr_event_type" -> col("event_type")), freqMs = 10000L, withSketch = true)
    val hourly = MetricsPreAgg.rollup(base, 3600000L)
    assert(Seq("p25", "p50", "p90", "p99")
      .forall(p => hourly.columns.contains(s"chq_rollup_$p")))
    // merged-sketch p50 must equal a direct hourly sketch's p50 (merge of
    // uncollapsed sketches is exact)
    val direct = ev
      .groupBy((col("ts_ms") - col("ts_ms") % 3600000L).as("chq_timestamp"),
        col("event_type").as("attr_event_type"))
      .agg(gf.ddsketch_agg(col("value")).as("sk"))
      .select(col("chq_timestamp"), col("attr_event_type"),
        gf.ddsketch_quantile(col("sk"), 0.5).as("p_direct"))
    val j = hourly.join(direct, Seq("chq_timestamp", "attr_event_type"))
    assert(j.filter(col("chq_rollup_p50") =!= col("p_direct")).count() == 0)
    assert(j.count() > 0)
  }

  test("compaction rewrites the dir: fewer files, same data, still sorted") {
    val ev = graft.model.Tables.events(spark, sf)
    val base = MetricsPreAgg.preAggregate(ev, col("ts_ms"), lit("m"), col("value"),
      Seq("attr_event_type" -> col("event_type")), freqMs = 60000L, withSketch = false)
    val dir = Files.createTempDirectory("graft_compact_").toString
    // three small appends → many files per dateint
    (0 until 3).foreach { i =>
      Segments.writeMetricSegments(base.filter(col("chq_tid") % 3 === i), dir,
        maxRecordsPerFile = 50)
    }
    val before = Segments.countDataFiles(spark, dir)
    val sumBefore = spark.read.parquet(dir)
      .agg(sum(col("chq_rollup_sum")), count(lit(1))).head()
    val compacted = Segments.compactMetricSegments(spark, dir)
    val after = Segments.countDataFiles(spark, dir)
    assert(after < before, s"expected shrink, got $before -> $after")
    // data survives the swap (row count exact; sum up to summation order)
    val sumAfter = compacted.agg(sum(col("chq_rollup_sum")), count(lit(1))).head()
    assert(math.abs(sumBefore.getDouble(0) - sumAfter.getDouble(0)) < 1e-6)
    assert(sumBefore.getLong(1) == sumAfter.getLong(1))
    // no temp/old residue
    val names = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!names.exists(n => n.contains("compact_tmp") || n.contains("compact_old")))
  }

  test("span segments: trace-contiguous sort survives write and compaction") {
    val spans = graft.model.Cooked.spans(spark, sf)
    val dir = Files.createTempDirectory("graft_spanseg_").toString
    (0 until 2).foreach { i =>
      Segments.writeSpanSegments(
        spans.filter(org.apache.spark.sql.functions.abs(
          org.apache.spark.sql.functions.hash(col("span_id"))) % 2 === i),
        dir, maxRecordsPerFile = 500)
    }
    val before = Segments.countDataFiles(spark, dir)
    val nBefore = spark.read.parquet(dir).count()
    val compacted = Segments.compactSpanSegments(spark, dir, maxRecordsPerFile = 5000)
    assert(Segments.countDataFiles(spark, dir) < before)
    assert(compacted.count() == nBefore)
    // per-file sortedness by (span_trace_id, chq_tsns)
    import spark.implicits._
    val unsorted = spark.read.parquet(dir)
      .select(org.apache.spark.sql.functions.input_file_name().as("f"),
        col("span_trace_id"), col("chq_tsns"))
      .as[(String, String, Long)].mapPartitions { it =>
        var bad = 0
        var prev: (String, String, Long) = null
        it.foreach { r =>
          if (prev != null && prev._1 == r._1 &&
            (prev._2 > r._2 || (prev._2 == r._2 && prev._3 > r._3))) bad += 1
          prev = r
        }
        Iterator(bad)
      }.collect().sum
    assert(unsorted == 0, s"$unsorted out-of-order rows within files")
  }

  test("trie clustering wildcards high-variety positions, keeps low-variety ones") {
    import spark.implicits._
    import graft.ingest.TrieFingerprint
    // 6 distinct entity names at one position (> maxVariants=4) must merge;
    // the 2-variant outcome position must survive
    val lines = (0 until 60).map { i =>
      val ent = ('a' + i % 6).toChar
      val out = if (i % 2 == 0) "success" else "failure"
      s"request for tenant$ent handled with $out"
    }.toDF("msg")
    val out = TrieFingerprint.withClusters(lines, "msg", maxVariants = 4)
      .select("trie_template").distinct().as[String].collect().sorted
    assert(out.toSeq == Seq(
      "request for <*> handled with failure",
      "request for <*> handled with success"))
  }

  test("retention expiry drops whole dateint partitions before the cutoff") {
    val dir = java.nio.file.Files.createTempDirectory("graft_expiry_").toString
    val base = graft.ingest.MetricsPreAgg.preAggregate(
      graft.model.Tables.events(spark, sf), col("ts_ms"), lit("events_value"),
      col("value"), Seq("attr_event_type" -> col("event_type")),
      freqMs = 3600000L, withSketch = false)
    Segments.writeMetricSegments(base, dir)
    val allDays = spark.read.parquet(dir).select("dateint").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(allDays.length > 2)
    val cutoff = allDays(allDays.length / 2)
    val expected = spark.read.parquet(dir)
      .filter(col("dateint") >= cutoff).count()
    val dropped = Segments.expireSegments(spark, dir, cutoff)
    assert(dropped == allDays.count(_ < cutoff))
    val back = spark.read.parquet(dir)
    assert(back.select(min(col("dateint"))).head().getInt(0) >= cutoff)
    assert(back.count() == expected)
    // idempotent: nothing left to expire
    assert(Segments.expireSegments(spark, dir, cutoff) == 0)
  }
}
