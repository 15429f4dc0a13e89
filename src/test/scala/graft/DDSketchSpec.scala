package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sketch.{DDSketch, functions => gf}
import org.apache.spark.sql.functions._

class DDSketchSpec extends AnyFunSuite {

  test("relative error guarantee on quantiles") {
    val alpha = 0.01
    val sk = new DDSketch(alpha)
    val rnd = new scala.util.Random(42)
    val xs = Array.fill(50000)(math.exp(rnd.nextGaussian() * 2))
    xs.foreach(sk.add)
    val sorted = xs.sorted
    for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)) {
      val exact = sorted(((q * (xs.length - 1))).toInt)
      val est = sk.quantile(q)
      assert(math.abs(est - exact) / exact <= 2 * alpha + 0.01,
        s"q=$q exact=$exact est=$est")
    }
    assert(sk.quantile(0.0) == sorted.head && sk.quantile(1.0) == sorted.last)
  }

  test("fractionBetween counts bucket read-backs within the bounds") {
    val sk = new DDSketch(0.01)
    (1 to 10).foreach(v => sk.add(v.toDouble))
    // read-backs are within 1% of the true values: [0, 5.4] captures 1..5
    val f = sk.fractionBetween(0.0, 5.4)
    assert(f == 0.5, s"got $f")
    // zeros live in the zero bucket and read back 0.0
    sk.add(0.0); sk.add(0.0)
    assert(sk.fractionBetween(0.0, 0.0) == 2.0 / 12.0)
    assert(sk.fractionBetween(100.0, 200.0) == 0.0)
    assert(sk.fractionBetween(5.0, 1.0) == 0.0) // inverted bounds
    // negatives read back from the negative store
    sk.add(-3.0)
    assert(sk.fractionBetween(-4.0, -2.0) == 1.0 / 13.0)
  }

  test("readbackVariance tracks the exact variance within the alpha bound") {
    val sk = new DDSketch(0.01)
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(20000)(math.abs(rnd.nextGaussian()) * 50 + 10)
    xs.foreach(sk.add)
    val mean = xs.sum / xs.length
    val exact = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
    val est = sk.readbackVariance
    // read-backs are within 1% of the true values → variance within ~2.5%
    assert(math.abs(est - exact) / exact < 0.05, s"exact=$exact est=$est")
  }

  test("merge equals bulk add; serde round-trips") {
    val a = new DDSketch(); val b = new DDSketch(); val all = new DDSketch()
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(10000)(rnd.nextDouble() * 1000 - 200) // incl. negatives
    xs.take(5000).foreach(a.add)
    xs.drop(5000).foreach(b.add)
    xs.foreach(all.add)
    val merged = DDSketch.deserialize(a.serialize()).merge(DDSketch.deserialize(b.serialize()))
    assert(merged.count == all.count && math.abs(merged.sum - all.sum) < 1e-6)
    assert(merged.min == all.min && merged.max == all.max)
    for (q <- Seq(0.1, 0.5, 0.9))
      assert(math.abs(merged.quantile(q) - all.quantile(q)) <=
        0.03 * math.abs(all.quantile(q)) + 1e-9)
  }

  test("bin budget collapses but keeps upper quantiles accurate") {
    val sk = new DDSketch(0.01, 64)
    (1 to 100000).foreach(i => sk.add(i.toDouble))
    assert(sk.binCount <= 64)
    val p99 = sk.quantile(0.99)
    assert(math.abs(p99 - 99000) / 99000.0 < 0.05)
  }

  test("spark aggregate: groupBy sketch stats are exact, quantile bounded") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (1 to 20000).map(i => (i % 4, i.toDouble)).toDF("g", "v")
    val out = df.groupBy($"g")
      .agg(gf.ddsketch_agg($"v").as("sk"))
      .select($"g",
        gf.ddsketch_stats($"sk").as("st"),
        gf.ddsketch_quantile($"sk", 0.5).as("p50"))
      .select($"g", $"st.count".as("cnt"), $"st.sum".as("sum"),
        $"st.min".as("mn"), $"st.max".as("mx"), $"p50")
      .collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getLong(1) == 5000)
      val mn = r.getDouble(3); val mx = r.getDouble(4)
      assert(mn >= 1.0 && mn <= 4.0 && mx >= 19997.0)
      val p50 = r.getDouble(5)
      assert(math.abs(p50 - 10000) / 10000.0 < 0.05)
    }
  }

  test("spark merge agg over pre-built sketches equals direct sketch") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (1 to 9000).map(i => (i % 3, i % 10, i.toDouble)).toDF("g", "sub", "v")
    val pre = df.groupBy($"g", $"sub").agg(gf.ddsketch_agg($"v").as("sk"))
    val merged = pre.groupBy($"g").agg(gf.ddsketch_merge_agg($"sk").as("sk"))
      .select($"g", gf.ddsketch_stats($"sk").as("st"))
      .select($"g", $"st.count".as("cnt"), $"st.sum".as("s"))
      .collect()
    assert(merged.length == 3)
    merged.foreach { r => assert(r.getLong(1) == 3000) }
    val total = merged.map(_.getDouble(2)).sum
    assert(math.abs(total - (1 to 9000).map(_.toDouble).sum) < 1e-3)
  }

  test("graft functions are registered in the SQL registry (extensions)") {
    // GraftExtensions injects ddsketch_* and graft_dot, so plain SQL text
    // can use the engine's native expressions
    val spark = TestSpark.spark
    import spark.implicits._
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)
    (1 to 1000).map(_.toDouble).toDF("v").createOrReplaceTempView("ext_vals")
    val q = spark.sql(
      "SELECT ddsketch_quantile(ddsketch_agg(v), 0.5) AS p50 FROM ext_vals")
      .head().getDouble(0)
    assert(math.abs(q - 500.0) / 500.0 < 0.03) // within the sketch alpha band
    val st = spark.sql(
      "SELECT ddsketch_stats(ddsketch_merge_agg(sk)).count AS c FROM " +
        "(SELECT ddsketch_agg(v, 0.01D) AS sk FROM ext_vals GROUP BY v % 7)")
      .head().getLong(0)
    assert(st == 1000L)
    // text dedup primitives: SQL form must agree with the Column form
    val txt = "one two three four five six seven eight nine ten"
    val wf = spark.sql(s"SELECT winnow_fps('$txt', 8, 4) AS f").head()
      .getSeq[Long](0).toSet
    val wfCol = Seq((1L, txt)).toDF("doc_id", "text")
    assert(graft.ops.TextOps.winnow(wfCol, k = 8, w = 4).collect()
      .map(_.getLong(1)).toSet == wf)
    val ms = spark.sql(s"SELECT minhash_sig('$txt', 16, 5) AS s").head()
      .getSeq[Long](0)
    assert(ms.length == 16 && ms.forall(v => v >= 0 && v < (1L << 48)))
  }

  test("readMetricSegments proto-compat flag decodes sketches-go bytes at rest") {
    import graft.ingest.{MetricsPreAgg, Segments}
    import TestSpark._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_skcompat_spec_").toString
    // a "reference-written" segment: chq_sketch holds DataDog-proto bytes
    val cooked = MetricsPreAgg.preAggregate(
      graft.model.Tables.events(spark, sf), col("ts_ms"),
      lit("events_value"), col("value"),
      Seq("attr_event_type" -> col("event_type")), freqMs = 60000L,
      withSketch = true)
      .withColumn("chq_sketch", gf.ddsketch_to_proto(col("chq_sketch")))
    Segments.writeMetricSegments(cooked, dir)
    // flag OFF: bytes come back verbatim (graft never rewrites at rest) —
    // and they are NOT graft-format (quantile on them must fail)
    spark.conf.unset(Segments.SketchProtoCompatKey)
    val rawRead = Segments.readMetricSegments(spark, dir)
    intercept[Exception] {
      rawRead.select(gf.ddsketch_quantile(col("chq_sketch"), 0.5)).collect()
    }
    // flag ON: the same dir serves graft sketches; quantiles match the
    // in-memory proto round-trip of the same cooked rows
    spark.conf.set(Segments.SketchProtoCompatKey, "true")
    try {
      val got = Segments.readMetricSegments(spark, dir)
        .select(col("chq_timestamp"), col("attr_event_type"),
          round(gf.ddsketch_quantile(col("chq_sketch"), 0.95), 6).as("p95"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
      val want = cooked
        .select(col("chq_timestamp"), col("attr_event_type"),
          round(gf.ddsketch_quantile(
            gf.ddsketch_from_proto(col("chq_sketch")), 0.95), 6).as("p95"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
      assert(got == want && got.nonEmpty)
    } finally spark.conf.unset(Segments.SketchProtoCompatKey)
  }

  test("writeMetricSegments proto-compat flag lands sketches-go bytes at rest") {
    import graft.ingest.{MetricsPreAgg, Segments}
    import TestSpark._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_skcw_spec_").toString
    val cooked = MetricsPreAgg.preAggregate(
      graft.model.Tables.events(spark, sf), col("ts_ms"),
      lit("events_value"), col("value"),
      Seq("attr_event_type" -> col("event_type")), freqMs = 60000L,
      withSketch = true)
    Segments.writeMetricSegments(cooked, dir, sketchProtoCompat = true)
    // at rest the column is PROTO, not graft-format: a plain (compat-off,
    // explicitly pinned) read cannot quantile it...
    intercept[Exception] {
      Segments.readMetricSegments(spark, dir, protoCompat = Some(false))
        .select(gf.ddsketch_quantile(col("chq_sketch"), 0.5)).collect()
    }
    // ...while decoding it as proto works — exactly what a reference
    // deployment's sketches-go reader sees
    val viaProto = Segments.readMetricSegments(spark, dir, protoCompat = Some(false))
      .select(col("chq_timestamp"), col("attr_event_type"),
        round(gf.ddsketch_quantile(
          gf.ddsketch_from_proto(col("chq_sketch")), 0.95), 6).as("p95"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    // and the READ flag closes the loop bit-exactly: write-flag +
    // read-flag == the in-memory to_proto→from_proto of the same rows
    // (the proto walk re-derives bucket midpoints, so vs the RAW graft
    // sketch the agreement is the alpha bound, not bit-equality)
    val viaFlag = Segments.readMetricSegments(spark, dir, protoCompat = Some(true))
      .select(col("chq_timestamp"), col("attr_event_type"),
        round(gf.ddsketch_quantile(col("chq_sketch"), 0.95), 6).as("p95"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val direct = cooked
      .select(col("chq_timestamp"), col("attr_event_type"),
        round(gf.ddsketch_quantile(gf.ddsketch_from_proto(
          gf.ddsketch_to_proto(col("chq_sketch"))), 0.95), 6).as("p95"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(viaProto == direct && viaFlag == direct && direct.nonEmpty)
    // vs the raw sketch: within the 1% relative-accuracy contract
    val raw = cooked
      .select(col("chq_timestamp"), col("attr_event_type"),
        gf.ddsketch_quantile(col("chq_sketch"), 0.95).as("p95"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    viaFlag.foreach { case (k, v) =>
      assert(math.abs(v - raw(k)) <= 0.021 * math.abs(raw(k)) + 1e-9,
        s"$k: $v vs ${raw(k)}")
    }
    // explicit per-read pin beats the session conf (no shared mutation)
    spark.conf.set(Segments.SketchProtoCompatKey, "true")
    try {
      val pinnedOff = Segments.readMetricSegments(spark, dir, protoCompat = Some(false))
      intercept[Exception] {
        pinnedOff.select(gf.ddsketch_quantile(col("chq_sketch"), 0.5)).collect()
      }
    } finally spark.conf.unset(Segments.SketchProtoCompatKey)
  }

  test("CountMin: overestimate-only, merge-order-insensitive, serde round-trip") {
    import graft.sketch.CountMin
    val vals = (0 until 5000).map(i => s"u${i % 137}")
    val exact = vals.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // bulk add vs two-way merge in both orders: identical cells
    val a = new CountMin(4, 256); vals.foreach(a.add(_))
    val b1 = new CountMin(4, 256); val b2 = new CountMin(4, 256)
    vals.zipWithIndex.foreach { case (v, i) => (if (i % 2 == 0) b1 else b2).add(v) }
    val m12 = new CountMin(4, 256).merge(b1).merge(b2)
    assert(java.util.Arrays.equals(a.serialize(), m12.serialize()))
    // estimates never undercount; with 137 keys in 256 cells they stay sane
    exact.foreach { case (k, n) =>
      assert(a.estimate(k) >= n, s"$k under-counted")
    }
    // serde round-trip preserves estimates and total
    val rt = CountMin.deserialize(a.serialize())
    assert(rt.count == vals.size.toLong)
    assert(exact.keys.forall(k => rt.estimate(k) == a.estimate(k)))
  }

  test("fraction/stdvar/stddev are SQL-registered like their siblings") {
    val spark = TestSpark.spark
    import spark.implicits._
    (1 to 100).map(_.toDouble).toDF("v").createOrReplaceTempView("frac_vals")
    val fr = spark.sql(
      "SELECT ddsketch_fraction(ddsketch_agg(v), 0, 1e9) AS f FROM frac_vals")
      .head().getDouble(0)
    assert(fr == 1.0)
    val sd = spark.sql(
      "SELECT ddsketch_stddev(ddsketch_agg(v)) AS s, " +
        "ddsketch_stdvar(ddsketch_agg(v)) AS v2 FROM frac_vals").head()
    assert(math.abs(sd.getDouble(0) * sd.getDouble(0) - sd.getDouble(1)) < 1e-9)
  }

  test("cms SQL registry: agg + merge + est compose in SQL text") {
    val spark = TestSpark.spark
    import spark.implicits._
    (1 to 300).map(i => s"k${i % 7}").toDF("v").createOrReplaceTempView("cms_vals")
    // every key appears >= 42 times; estimate can only overcount
    val est = spark.sql(
      "SELECT cms_est(cms_merge_agg(sk), 'k3') AS e FROM " +
        "(SELECT cms_agg(v) AS sk FROM cms_vals GROUP BY substr(v, 2) % 2)")
      .head().getLong(0)
    assert(est >= 42L && est <= 300L, s"est $est")
  }

  test("DataDog-proto interop: encode -> decode preserves quantiles and counts") {
    import graft.sketch.DDSketchProto
    val sk = new DDSketch()
    val vals = (1 to 3000).map(i => (i % 997 + 1) * 0.37) ++
      Seq(0.0, 0.0, -5.5, -120.25, 1e6)
    vals.foreach(sk.add)
    val back = DDSketchProto.decode(DDSketchProto.encode(sk))
    assert(back.count == sk.count)
    // bucket contents survive exactly, so quantiles agree within one
    // midpoint re-derivation (same alpha, same indices -> identical walk)
    Seq(0.1, 0.5, 0.9, 0.99).foreach { q =>
      val a = sk.quantile(q); val b = back.quantile(q)
      assert(math.abs(a - b) <= 2 * sk.alpha * math.abs(a) + 1e-9,
        s"q=$q: $a vs $b")
    }
    // negatives import on the negative store, not as mangled positives
    assert(back.quantile(0.0) < 0.0)
  }

  test("DataDog-proto interop: contiguous-bin stores and index offsets decode") {
    import graft.sketch.DDSketchProto
    // hand-build proto bytes: gamma for alpha=0.01, indexOffset=2,
    // positive store with contiguousBinCounts [3,0,7] at offset 10 ->
    // buckets {10:3, 12:7}, shifted by round(indexOffset)=2 -> {8, 10}
    def vint(v0: Long): Array[Byte] = {
      var v = v0; val b = scala.collection.mutable.ArrayBuffer[Byte]()
      while ((v & ~0x7fL) != 0) { b += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
      b += v.toByte; b.toArray
    }
    def dbl(v: Double): Array[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(v)
      (0 until 8).map(i => ((bits >>> (8 * i)) & 0xff).toByte).toArray
    }
    val gamma = (1.0 + 0.01) / (1.0 - 0.01)
    val mapping = Array[Byte]((1 << 3 | 1).toByte) ++ dbl(gamma) ++
      Array[Byte]((2 << 3 | 1).toByte) ++ dbl(2.0)
    val packed = dbl(3.0) ++ dbl(0.0) ++ dbl(7.0)
    val store = Array[Byte]((2 << 3 | 2).toByte) ++ vint(packed.length.toLong) ++ packed ++
      Array[Byte]((3 << 3 | 0).toByte) ++ vint((10L << 1) ^ 0L) // zigzag(10)
    val msg = Array[Byte]((1 << 3 | 2).toByte) ++ vint(mapping.length.toLong) ++ mapping ++
      Array[Byte]((2 << 3 | 2).toByte) ++ vint(store.length.toLong) ++ store
    val sk = graft.sketch.DDSketchProto.decode(msg)
    assert(sk.count == 10L)
    // read-backs sit at the shifted midpoints 2*gamma^8/(gamma+1), ^10
    def mid(i: Int) = 2.0 * math.pow(gamma, i) / (gamma + 1.0)
    assert(math.abs(sk.quantile(0.0) - mid(8)) / mid(8) <= 2 * 0.01 + 1e-9)
    assert(math.abs(sk.quantile(1.0) - mid(10)) / mid(10) <= 2 * 0.01 + 1e-9)
  }

  test("ddsketch_from_proto bridges proto bytes into every sketch function") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.sketch.DDSketchProto
    val sk = new DDSketch()
    (1 to 500).foreach(i => sk.add(i.toDouble))
    val df = Seq(Tuple1(DDSketchProto.encode(sk))).toDF("proto")
      .withColumn("sk", gf.ddsketch_from_proto(col("proto")))
    val p50 = df.select(gf.ddsketch_quantile(col("sk"), 0.5))
      .head().getDouble(0)
    assert(math.abs(p50 - 250.0) / 250.0 <= 2 * sk.alpha + 1e-9, p50.toString)
    // SQL registry path
    df.createOrReplaceTempView("proto_sketches")
    val viaSql = spark.sql(
      "SELECT ddsketch_quantile(ddsketch_from_proto(proto), 0.5) FROM proto_sketches")
      .head().getDouble(0)
    assert(viaSql == p50)
  }
}
