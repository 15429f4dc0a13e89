package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.OtelProto
import graft.ingest.OtelProto.Encode

class OtelProtoSpec extends AnyFunSuite {
  import TestSpark._

  private def sampleBytes: Array[Byte] =
    OtelProto.Encode.logsData(
      resourceAttrs = Seq("service.name" -> "checkout", "k8s.namespace.name" -> "prod"),
      scopeName = "graft-test",
      records = Seq(
        Encode.logRecord(1704067200123000000L, 17, "ERROR",
          "payment failed", Seq("http.method" -> "POST", "retries" -> "3")),
        Encode.logRecord(1704067201456000000L, 9, "INFO",
          "payment ok", Seq("http.method" -> "GET"))),
      scopeAttrs = Seq("library.version" -> "1.2.3"))

  test("wire round-trip: encode → parse") {
    val logs = OtelProto.parseLogs(sampleBytes)
    assert(logs.size == 2)
    val e = logs.head
    assert(e.timeUnixNano == 1704067200123000000L)
    assert(e.severityText == "ERROR" && e.severityNumber == 17)
    assert(e.body == "payment failed")
    assert(e.attrs == Map("http_method" -> "POST", "retries" -> "3"))
    assert(e.resourceAttrs == Map("service_name" -> "checkout",
      "k8s_namespace_name" -> "prod"))
    assert(e.scopeName == "graft-test")
    assert(e.scopeAttrs == Map("library_version" -> "1.2.3"))
  }

  test("readLogs: binpb.gz file → cooked frame with flattened columns") {
    val dir = Files.createTempDirectory("graft_otel_")
    val gz = dir.resolve("logs.binpb.gz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
    out.write(sampleBytes); out.close()

    val df = graft.ingest.Readers.readAny(spark, gz.toString)
    assert(df.count() == 2)
    val cols = df.columns.toSet
    assert(cols.contains("chq_timestamp") && cols.contains("chq_tsns"))
    assert(cols.contains("resource_service_name") && cols.contains("attr_http_method"))
    val err = df.filter(org.apache.spark.sql.functions.col("log_level") === "ERROR").head()
    assert(err.getAs[Long]("chq_timestamp") == 1704067200123L)
    assert(err.getAs[String]("log_message") == "payment failed")
    assert(err.getAs[String]("attr_retries") == "3")
    assert(err.getAs[String]("resource_k8s_namespace_name") == "prod")
    // instrumentation-scope attributes widen under the scope_* namespace
    assert(err.getAs[String]("scope_library_version") == "1.2.3")
    // second record has no `retries` attr → null (dynamic-schema union)
    val ok = df.filter(org.apache.spark.sql.functions.col("log_level") === "INFO").head()
    assert(ok.getAs[String]("attr_retries") == null)
  }

  test("readLogs fpcCompat: off by default; on → reference-parity chq_fingerprint") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_otel_fpc_")
    val gz = dir.resolve("logs.binpb.gz")
    val blob = OtelProto.Encode.logsData(
      Seq("service.name" -> "checkout"), "graft-test",
      Seq(
        Encode.logRecord(1L, 9, "INFO",
          """{"msg": "cart emptied ok", "cart": 7}""", Nil),
        Encode.logRecord(2L, 9, "INFO",
          "INFO checkout request user=12 in 30ms", Nil),
        Encode.logRecord(3L, 9, "INFO",
          "INFO checkout request user=99 in 515ms", Nil)))
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
    out.write(blob); out.close()

    // default: the graft-native frame, no compat fingerprint column
    assert(!OtelProto.readLogs(spark, gz.toString).columns.contains("chq_fingerprint"))

    // per-read pin: JSON body bit-equals the pure item+key hash; the two
    // same-template lines share one cluster id; severity stays the record's
    val on = OtelProto.readLogs(spark, gz.toString, fpcCompat = Some(true))
    assert(!on.columns.contains("fpc_level"))
    val json = on.filter(col("chq_tsns") === 1L).head()
    // "emptied" is outside the calibrated word list and drops from the
    // items (reference parity: unknown prose words don't tokenize)
    assert(json.getAs[Long]("chq_fingerprint") ==
      graft.ops.FingerprintCompat.fingerprintHash(
        Seq("cart", "ok"), Seq("cart", "msg")))
    assert(json.getAs[String]("log_level") == "INFO")
    val fps = on.filter(col("chq_tsns") =!= 1L)
      .select(col("chq_fingerprint")).distinct().collect()
    assert(fps.length == 1)

    // session-conf default: same assignment through the Readers front door
    spark.conf.set(OtelProto.LogsFpcCompatKey, "true")
    try {
      val viaConf = graft.ingest.Readers.readAny(spark, gz.toString)
      assert(viaConf.filter(col("chq_tsns") === 1L).head()
        .getAs[Long]("chq_fingerprint") == json.getAs[Long]("chq_fingerprint"))
    } finally spark.conf.unset(OtelProto.LogsFpcCompatKey)
  }

  test("readLogs fpcOrgAttr: per-tenant tries — cross-org templates never merge") {
    import org.apache.spark.sql.functions.col
    // the reference's ingest worker fingerprints per tenant
    // (fingerprintManager.GetTenant(orgID) before Fingerprint): a batch
    // mixing orgs must NOT Jaccard-merge one org's template into
    // another's cluster. svc-a emits a dominant template twice; svc-b
    // emits ONE line whose items overlap it at Jaccard 0.667 (the same
    // merge shape the streaming spec pins). One shared trie merges b
    // into a's cluster; per-tenant routing keeps them apart.
    val dir = Files.createTempDirectory("graft_otel_fpc_org_")
    def writeGz(name: String, svc: String, bodies: Seq[(Long, String)]): Unit = {
      val blob = OtelProto.Encode.logsData(
        Seq("service.name" -> svc), "graft-test",
        bodies.map { case (ts, b) => Encode.logRecord(ts, 9, "INFO", b, Nil) })
      val out = new java.util.zip.GZIPOutputStream(
        Files.newOutputStream(dir.resolve(name)))
      out.write(blob); out.close()
    }
    writeGz("a.binpb.gz", "svc-a", Seq(
      1L -> "INFO request user=12 handled /api/v4/do?id=5 in 30ms",
      2L -> "INFO request user=99 handled /api/v4/do?id=8 in 515ms"))
    writeGz("b.binpb.gz", "svc-b", Seq(
      3L -> "INFO signup fetch user=7 handled /api/v4/do?id=9 in 40ms"))

    def fps(df: org.apache.spark.sql.DataFrame, svc: String): Set[Long] =
      df.filter(col("resource_service_name") === svc)
        .select("chq_fingerprint").distinct().collect()
        .map(_.getLong(0)).toSet

    val shared = OtelProto.readLogs(spark, dir.toString, fpcCompat = Some(true))
    val perOrg = OtelProto.readLogs(spark, dir.toString, fpcCompat = Some(true),
      fpcOrgAttr = Some("resource_service_name"))
    // svc-a's own cluster is unaffected by the tenancy split
    assert(fps(shared, "svc-a").size == 1 &&
      fps(shared, "svc-a") == fps(perOrg, "svc-a"))
    // one shared trie cross-tenant-merges svc-b's line into svc-a's
    // cluster; per-tenant tries keep it separate
    assert(fps(shared, "svc-b") == fps(shared, "svc-a"))
    assert(fps(perOrg, "svc-b") != fps(perOrg, "svc-a"))
    // a missing org column is a caller error, not a silent single-trie read
    intercept[IllegalArgumentException] {
      OtelProto.readLogs(spark, dir.toString, fpcCompat = Some(true),
        fpcOrgAttr = Some("resource_no_such_attr"))
    }
  }

  test("kvlist + array attribute values parse structurally (not as garbage)") {
    val rec = Encode.logRecord(1L, 9, "INFO", "body", Nil) ++
      Encode.ld(6, Encode.str(1, "ctx") ++ Encode.ld(2,
        Encode.anyKvList(Seq("a" -> "1", "b" -> "x")))) ++
      Encode.ld(6, Encode.str(1, "tags") ++ Encode.ld(2,
        Encode.anyArray(Seq("p", "q"))))
    val blob = Encode.logsData(Nil, "s", Seq(rec))
    val logs = OtelProto.parseLogs(blob)
    assert(logs.head.attrs("ctx") == "{a:1,b:x}")
    assert(logs.head.attrs("tags") == "[p,q]")
  }

  test("truncated message raises instead of reading past the bound") {
    val blob = sampleBytes
    intercept[IllegalArgumentException] {
      OtelProto.parseLogs(blob.take(blob.length - 3))
    }
  }

  test("metrics wire round-trip: gauge + monotonic sum") {
    val blob = Encode.metricsData(
      Seq("service.name" -> "svc-a"), "graft-test",
      Seq(
        Encode.gaugeMetric("cpu_temp", Seq(
          Encode.numberDp(1704067200000000000L, 42.5, Seq("core" -> "0")),
          Encode.numberDp(1704067210000000000L, 43.25, Seq("core" -> "1")))),
        Encode.sumMetric("requests_total", monotonic = true, Seq(
          Encode.numberDp(1704067200000000000L, 100.0, Seq("code" -> "200"))))),
      scopeAttrs = Seq("lib.ver" -> "9"))
    val ms = OtelProto.parseMetrics(blob)
    assert(ms.size == 3)
    val gauge = ms.filter(_.metricName == "cpu_temp")
    assert(gauge.map(_.metricType).distinct == Seq("gauge"))
    assert(gauge.map(_.value).sorted == Seq(42.5, 43.25))
    assert(gauge.head.resourceAttrs == Map("service_name" -> "svc-a"))
    val ctr = ms.find(_.metricName == "requests_total").get
    assert(ctr.metricType == "count" && ctr.value == 100.0)
    assert(ctr.attrs == Map("code" -> "200"))
    assert(ctr.scopeAttrs == Map("lib_ver" -> "9"))
  }

  test("exemplar wire round-trip: every datapoint kind, ids, filtered attrs") {
    val ex1 = Encode.exemplar(1704067205000000000L, 7.5,
      "00000000000000000000000000000025", "0000000000000025",
      Seq("user.id" -> "9"))
    val ex2 = Encode.exemplar(1704067206000000000L, 2.25,
      "000000000000000000000000000000ff", "00000000000000ff")
    val blob = Encode.metricsData(
      Seq("service.name" -> "svc-a"), "graft-test",
      Seq(
        Encode.gaugeMetric("g", Seq(
          Encode.numberDp(1704067200000000000L, 42.5, Seq("core" -> "0"),
            exemplars = Seq(ex1)))),
        Encode.sumMetric("s", monotonic = true, Seq(
          Encode.numberDp(1704067200000000000L, 100.0, Seq("code" -> "200"),
            exemplars = Seq(ex2)))),
        Encode.histogramMetric("h", Seq(
          Encode.histogramDp(1704067200000000000L, 3L, 9.0, 1.0, 5.0,
            Seq(3L), Nil, Seq("hx" -> "1"), exemplars = Seq(ex1, ex2))))))
    val exs = OtelProto.parseExemplars(blob)
    assert(exs.size == 4)
    val g = exs.find(_.metricName == "g").get
    assert(g.metricType == "gauge" && g.value == 7.5)
    assert(g.traceId == "00000000000000000000000000000025")
    assert(g.spanId == "0000000000000025")
    assert(g.timeUnixNano == 1704067205000000000L)
    // datapoint attrs union the exemplar's filtered attributes
    assert(g.attrs == Map("core" -> "0", "user_id" -> "9"))
    assert(exs.find(_.metricName == "s").get.metricType == "sum")
    assert(exs.count(_.metricName == "h") == 2)
    // the OTHER decoders must skip exemplars losslessly: this is the
    // regression gate for the skip(length-delimited) compound-assignment
    // bug (pos += readLen() read the pre-advance pos and desynced)
    val ms = OtelProto.parseMetrics(blob)
    assert(ms.map(m => (m.metricName, m.value)).toSet ==
      Set(("g", 42.5), ("s", 100.0)))
    val hs = OtelProto.parseHistograms(blob)
    assert(hs.size == 1 && hs.head.count == 3L && hs.head.sum == 9.0)
  }

  test("histogram wire round-trip: packed buckets/bounds, count/sum/min/max") {
    val blob = Encode.metricsData(
      Seq("service.name" -> "svc-h"), "graft-test",
      Seq(Encode.histogramMetric("latency", Seq(
        Encode.histogramDp(1704067200000000000L, 10L, 123.5, 0.5, 90.0,
          Seq(2L, 5L, 3L), Seq(1.0, 10.0), Seq("route" -> "/api"))))),
      scopeAttrs = Seq("lib.ver" -> "9"))
    val hs = OtelProto.parseHistograms(blob)
    assert(hs.size == 1)
    val h = hs.head
    assert(h.metricName == "latency" && h.count == 10L && h.sum == 123.5)
    assert(h.min == 0.5 && h.max == 90.0)
    assert(h.bucketCounts == Seq(2L, 5L, 3L) && h.explicitBounds == Seq(1.0, 10.0))
    assert(h.attrs == Map("route" -> "/api"))
    assert(h.resourceAttrs == Map("service_name" -> "svc-h"))
    assert(h.scopeAttrs == Map("lib_ver" -> "9"))
  }

  test("expo histogram wire round-trip: zigzag scale/offset, packed counts") {
    // negative scale and negative bucket offset exercise the zigzag path
    val blob = Encode.metricsData(
      Seq("service.name" -> "svc-e"), "graft-test",
      Seq(Encode.expoHistogramMetric("latency_expo", Seq(
        Encode.expoHistogramDp(1704067200000000000L, 12L, 55.25, 0.004, 30.0,
          scale = -1, zeroCount = 2L, posOffset = -3,
          posCounts = Seq(1L, 0L, 4L, 5L), Seq("route" -> "/api"))))),
      scopeAttrs = Seq("lib.ver" -> "9"))
    val hs = OtelProto.parseExpoHistograms(blob)
    assert(hs.size == 1)
    val h = hs.head
    assert(h.metricName == "latency_expo" && h.count == 12L && h.sum == 55.25)
    assert(h.min == 0.004 && h.max == 30.0)
    assert(h.scale == -1 && h.zeroCount == 2L)
    assert(h.posOffset == -3 && h.posCounts == Seq(1L, 0L, 4L, 5L))
    assert(h.attrs == Map("route" -> "/api"))
    assert(h.resourceAttrs == Map("service_name" -> "svc-e"))
    assert(h.scopeAttrs == Map("lib_ver" -> "9"))
  }

  test("ExpoBridge: exact bin mapping, exact stats, bounded quantiles") {
    import graft.sketch.ExpoBridge
    // gamma lands within an ulp of the base (no double alpha maps exactly
    // for base 2); the ~1e-16 relative midpoint error is far inside the
    // oracle's round-6 window
    val g = (1.0 + ExpoBridge.alphaFor(2.0)) / (1.0 - ExpoBridge.alphaFor(2.0))
    assert(math.abs(g - 2.0) <= 2 * math.ulp(2.0), s"gamma=$g")
    // values 1.5 (bucket k=0), 3 (k=1), 3.5 (k=1), 12 (k=3): offset 0,
    // counts [1,2,0,1]; plus two zeros
    val sk = ExpoBridge.fromExpo(scale = 0, zeroCount = 2L,
      posOffset = 0, posCounts = Seq(1L, 2L, 0L, 1L), 0, Nil,
      count = 6L, sum = 20.0, min = 0.0, max = 12.0)
    assert(sk.count == 6L && sk.sum == 20.0)
    // rank(0.9) = floor(0.9*5)+1 = 5 → 2 zeros + 1 + 2 → qi=2 bin →
    // midpoint 2*2^2/3 = 8/3, within [min,max]
    assert(math.abs(sk.quantile(0.9) - 8.0 / 3.0) < 1e-12)
    assert(sk.quantile(0.0) == 0.0 && sk.quantile(1.0) == 12.0)
    // serialization round-trips the non-default gamma
    val back = graft.sketch.DDSketch.deserialize(sk.serialize())
    assert(back.quantile(0.9) == sk.quantile(0.9))
  }

  test("summary wire round-trip: count/sum and quantile values") {
    val blob = Encode.metricsData(
      Seq("service.name" -> "svc-s"), "graft-test",
      Seq(Encode.summaryMetric("rpc_latency", Seq(
        Encode.summaryDp(1704067200000000000L, 20L, 44.5,
          Seq(0.5 -> 1.75, 0.99 -> 9.25), Seq("route" -> "/rpc"))))),
      scopeAttrs = Seq("lib.ver" -> "9"))
    val ss = OtelProto.parseSummaries(blob)
    assert(ss.size == 1)
    val s0 = ss.head
    assert(s0.metricName == "rpc_latency" && s0.count == 20L && s0.sum == 44.5)
    assert(s0.quantileValues == Seq(0.5 -> 1.75, 0.99 -> 9.25))
    assert(s0.attrs == Map("route" -> "/rpc"))
    assert(s0.resourceAttrs == Map("service_name" -> "svc-s"))
    assert(s0.scopeAttrs == Map("lib_ver" -> "9"))
  }

  test("ExplicitBridge: midpoint re-binning, exact stats, bounded quantiles") {
    import graft.sketch.ExplicitBridge
    // buckets (-inf,10](10,100](100,inf) with counts 4/5/1, min 2, max 150:
    // reps = (2+10)/2=6, (10+100)/2=55, (100+150)/2=125
    assert(ExplicitBridge.representatives(Seq(10.0, 100.0), 2.0, 150.0) ==
      Seq(6.0, 55.0, 125.0))
    val sk = ExplicitBridge.fromExplicit(Seq(4L, 5L, 1L), Seq(10.0, 100.0),
      count = 10L, sum = 400.0, min = 2.0, max = 150.0)
    // datapoint stats are authoritative, not midpoint-derived
    assert(sk.count == 10L && sk.sum == 400.0)
    assert(sk.quantile(0.0) == 2.0 && sk.quantile(1.0) == 150.0)
    // rank(0.5) = floor(0.5*9)+1 = 5 → falls in the 55-rep bucket; the
    // sketch answer is 55 within alpha relative accuracy, clamped in range
    val p50 = sk.quantile(0.5)
    assert(math.abs(p50 - 55.0) / 55.0 < 0.02, s"p50=$p50")
    // serialization round-trips the re-binned mass
    val back = graft.sketch.DDSketch.deserialize(sk.serialize())
    assert(back.quantile(0.5) == p50)
  }

  test("spans wire round-trip: ids, kind/status enums, duration") {
    val tid = "0123456789abcdef0123456789abcdef"
    val sid = "fedcba9876543210"
    val blob = Encode.tracesData(Seq((
      Seq("service.name" -> "svc-b"), "graft-test",
      Seq(
        Encode.span(tid, sid, "", "GET /", 2,
          1704067200000000000L, 1704067200250000000L, 2, "boom",
          Seq("http.status" -> "500")),
        Encode.span(tid, "00000000000000aa", sid, "child", 3,
          1704067200010000000L, 1704067200020000000L, 1, "", Nil)))),
      scopeAttrs = Seq("lib.ver" -> "9"))
    val sp = OtelProto.parseSpans(blob)
    assert(sp.size == 2)
    val root = sp.find(_.parentSpanId.isEmpty).get
    assert(root.traceId == tid && root.spanId == sid)
    assert(root.kind == 2 && root.statusCode == 2 && root.statusMessage == "boom")
    assert(root.attrs == Map("http_status" -> "500"))
    assert(root.scopeAttrs == Map("lib_ver" -> "9"))
    val child = sp.find(_.parentSpanId.nonEmpty).get
    assert(child.parentSpanId == sid)
    assert((child.endUnixNano - child.startUnixNano) == 10000000L)
  }

  test("readSpans: binpb.gz → cooked span frame") {
    val tid = "0123456789abcdef0123456789abcdef"
    val blob = Encode.tracesData(Seq((
      Seq("service.name" -> "svc-b"), "graft-test",
      Seq(Encode.span(tid, "fedcba9876543210", "", "GET /", 2,
        1704067200000000000L, 1704067200250000000L, 2, "boom",
        Seq("http.status" -> "500"))))))
    val dir = Files.createTempDirectory("graft_otel_t_")
    val gz = dir.resolve("traces.binpb.gz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
    out.write(blob); out.close()
    val df = OtelProto.readSpans(spark, gz.toString)
    val r = df.head()
    assert(r.getAs[String]("span_trace_id") == tid)
    assert(r.getAs[String]("span_kind") == "SPAN_KIND_SERVER")
    assert(r.getAs[String]("span_status_code") == "STATUS_CODE_ERROR")
    assert(r.getAs[Long]("span_duration") == 250L)
    assert(r.getAs[Long]("chq_timestamp") == 1704067200000L)
    assert(r.getAs[String]("resource_service_name") == "svc-b")
    assert(r.getAs[String]("attr_http_status") == "500")
    // reference-parity span fingerprint at ingest: no k8s attrs ->
    // "unknown", pdata-style kind name, plain-name branch (http.status
    // is not http.request.method)
    assert(r.getAs[Long]("chq_fingerprint") ==
      graft.ops.FingerprintCompat.xxh64("unknown##unknown##svc-b##Server##GET /"))
  }
}
