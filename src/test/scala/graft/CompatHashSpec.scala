package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.CompatHash

/** Bit-compat gates for the reference hash surface
  * (tid.go FNV-1a TID, fingerprint.go 31-poly index fingerprints).
  * The reference folds in the test are written INDEPENDENTLY of the
  * production byte loops (BigInt mod-2^64 arithmetic and code-point
  * slicing), so a transcription slip in either side fails the gate.
  */
class CompatHashSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val Mod = BigInt(1) << 64

  /** independent FNV-1a 64 in BigInt arithmetic */
  private def fnvRef(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = BigInt("cbf29ce484222325", 16)
    for (b <- bytes) h = ((h ^ BigInt(b & 0xff)) * BigInt("100000001b3", 16)) % Mod
    h.longValue
  }

  /** independent 31-poly 64 in BigInt arithmetic */
  private def javaRef(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = BigInt(0)
    for (b <- bytes) h = (h * 31 + BigInt(b & 0xff)) % Mod
    h.longValue
  }

  /** Go-faithful rune trigrams: every 3-code-point substring */
  private def trigramsRef(s: String): Set[String] = {
    val cps = s.codePoints().toArray
    if (cps.length < 3) Set.empty
    else (0 to cps.length - 3).map(i => new String(cps, i, 3)).toSet
  }

  test("fnv1a64 matches the public FNV-1a test vectors") {
    // vectors from the published FNV reference (Fowler–Noll–Vo):
    assert(CompatHash.fnv1a64Bytes(Array.emptyByteArray) == 0xcbf29ce484222325L)
    assert(CompatHash.fnv1a64Bytes("a".getBytes("UTF-8")) == 0xaf63dc4c8601ec8cL)
    assert(CompatHash.fnv1a64Bytes("foobar".getBytes("UTF-8")) == 0x85944171f73967e8L)
  }

  test("java_hash64 matches the 31-polynomial (Java String.hashCode widened)") {
    assert(CompatHash.javaHash64Bytes(Array.emptyByteArray) == 0L)
    // "abc" = 97*31^2 + 98*31 + 99
    assert(CompatHash.javaHash64Bytes("abc".getBytes("UTF-8")) == 96354L)
    assert(CompatHash.javaHash64Bytes("abc".getBytes("UTF-8")) == "abc".hashCode.toLong)
  }

  test("expression (codegen path) equals the independent BigInt folds on unicode") {
    val rnd = new scala.util.Random(42)
    val strs = (0 until 200).map { _ =>
      val n = rnd.nextInt(40)
      (0 until n).map { _ =>
        rnd.nextInt(4) match {
          case 0 => ('a' + rnd.nextInt(26)).toChar.toString
          case 1 => "=|:"(rnd.nextInt(3)).toString
          case 2 => "äßśπ漢字"(rnd.nextInt(6)).toString
          case 3 => new String(Character.toChars(0x1F600 + rnd.nextInt(64)))
        }
      }.mkString
    } :+ "" :+ "a" :+ "foobar"
    val rows = strs.toDF("s")
      .select($"s", CompatHash.fnv1a64($"s").as("f"), CompatHash.javaHash64($"s").as("j"))
      .collect()
    rows.foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(1) == fnvRef(s), s"fnv mismatch on '$s'")
      assert(r.getLong(2) == javaRef(s), s"java31 mismatch on '$s'")
    }
  }

  test("SQL registry: fnv1a64 / java_hash64 callable from spark.sql") {
    val out = spark.sql("SELECT fnv1a64('foobar') AS f, java_hash64('abc') AS j").collect()(0)
    assert(out.getLong(0) == 0x85944171f73967e8L)
    assert(out.getLong(1) == 96354L)
  }

  test("tid: sorted k=v| serialization, empty/null values skipped (tid.go semantics)") {
    val df = Seq(("cpu.usage", "prod", ""), ("mem.usage", "", "us-east"))
      .toDF("name", "env", "region")
    val out = df.select(
      $"name",
      CompatHash.tid($"name", lit("gauge"),
        Seq("attr_env" -> $"env", "attr_region" -> lit(null).cast("string"),
          "resource_region" -> $"region")).as("tid")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // row 1: region label empty+null skipped; sorted keys:
    // attr_env < chq_metric_type < metric_name
    assert(out("cpu.usage") ==
      fnvRef("attr_env=prod|chq_metric_type=gauge|metric_name=cpu.usage|"))
    // row 2: env empty -> skipped; resource_region sorts AFTER metric_name
    assert(out("mem.usage") ==
      fnvRef("chq_metric_type=gauge|metric_name=mem.usage|resource_region=us-east|"))
  }

  test("tid: label keys sort in UTF-8 byte order, not UTF-16 code-unit order") {
    // U+1F600 (UTF-8 f0 9f 98 80) vs U+E000 (UTF-8 ee 80 80): Scala's
    // String ordering compares UTF-16 units (d83d < e000 → 😀 first) but
    // Go's strings.Compare is UTF-8 byte order (f0 > ee → 😀 LAST). The
    // reference-exact concatenation must use the Go order (ADVICE r12).
    val astral = new String(Character.toChars(0x1F600))
    val privUse = "k"
    val df = Seq(("m", "a", "b")).toDF("name", "x", "y")
    val got = df.select(CompatHash.tid($"name", lit("gauge"),
      Seq(astral -> $"x", privUse -> $"y")).as("tid"))
      .head().getLong(0)
    assert(got == fnvRef(
      s"chq_metric_type=gauge|metric_name=m|${privUse}=b|${astral}=a|"))
  }

  test("trigrams column equals Go rune slicing incl. astral code points") {
    val vals = Seq("", "ab", "abc", "abcd", "svc-api", "a漢b字c", "😀😁😂🤣x",
      "ääää", "a:b|c=d")
    val rows = vals.toDF("v")
      .select($"v", CompatHash.trigrams($"v").as("t")).collect()
    rows.foreach { r =>
      val got = r.getSeq[String](1).toSet
      assert(got == trigramsRef(r.getString(0)), s"trigrams mismatch on '${r.getString(0)}'")
    }
  }

  test("preAggregate tidCol hook: cooked rows carry the reference FNV-1a TID") {
    val raw = Seq((1000L, "api", 1.0), (2000L, "api", 3.0), (1500L, "web", 2.0))
      .toDF("ts_ms", "svc", "v")
    val labels = Seq("attr_service" -> $"svc")
    val cooked = graft.ingest.MetricsPreAgg.preAggregate(
      raw, $"ts_ms", lit("req.count"), $"v", labels,
      freqMs = 10000L, withSketch = false,
      tidCol = Some(CompatHash.tid(lit("req.count"), lit("count"), labels)))
    val tids = cooked.select($"attr_service", $"chq_tid").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tids("api") ==
      fnvRef("attr_service=api|chq_metric_type=count|metric_name=req.count|"))
    assert(tids("web") ==
      fnvRef("attr_service=web|chq_metric_type=count|metric_name=req.count|"))
  }

  test("trigramExactFingerprints reproduces the reference policy fingerprints") {
    val v = "svc-api"
    val field = "resource_service_name"
    val want = (Set(".*", v) ++ trigramsRef(v)).map(t => javaRef(s"$field:$t"))
    val got = Seq(v).toDF("v")
      .select(CompatHash.trigramExactFingerprints(lit(field), $"v"))
      .collect()(0).getSeq[Long](0).toSet
    assert(got == want)
  }

  test("xxh64 column equals the driver fold on random strings, short and striped") {
    val rnd = new scala.util.Random(42)
    val strs = (0 until 60).map { i =>
      val len = if (i % 3 == 0) rnd.nextInt(31) else 20 + rnd.nextInt(150)
      rnd.alphanumeric.take(len).mkString + (if (i % 5 == 0) " ##/{}" else "")
    } :+ "" :+ ("x" * 32) :+ ("y" * 31) :+ ("z" * 33)
    val got = strs.toDF("s").select($"s", CompatHash.xxh64($"s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strs.foreach { s =>
      assert(got(s) == graft.ops.FingerprintCompat.xxh64(s),
        s"xxh64 mismatch for len=${s.length}")
    }
    // SQL registration
    assert(spark.sql("SELECT xxh64('')").head().getLong(0) ==
      graft.ops.FingerprintCompat.xxh64(""))
  }

  test("spanFingerprint: branch priority, unknown defaults, empty parts kept") {
    import graft.ops.FingerprintCompat.{xxh64 => x64}
    def fp(cluster: String, ns: String, svc: String, kind: String, name: String,
        msys: String = "", mop: String = "", mdest: String = "",
        db: String = "", meth: String = "", tmpl: String = ""): Long =
      Seq(1).toDF("i").select(CompatHash.spanFingerprint(
        lit(cluster), lit(ns), lit(svc), lit(kind), lit(name),
        messagingSystem = lit(msys), messagingOperationType = lit(mop),
        messagingDestinationName = lit(mdest),
        dbSystem = lit(db), httpRequestMethod = lit(meth),
        urlTemplate = lit(tmpl))).head().getLong(0)
    // plain-name fallback
    assert(fp("c1", "n1", "s1", "Server", "op") ==
      x64("c1##n1##s1##Server##op"))
    // empty resource attrs -> "unknown" (spans.go getFromResource)
    assert(fp("", "", "", "Client", "op") ==
      x64("unknown##unknown##unknown##Client##op"))
    // messaging branch wins over db and http; empty sub-attrs KEPT as
    // empty join parts (Go strings.Join)
    assert(fp("c", "n", "s", "K", "op", msys = "kafka", db = "pg", meth = "GET") ==
      x64("c##n##s##K##kafka####"))
    // db branch: span name + 6 fields, absent ones empty
    assert(fp("c", "n", "s", "K", "op", db = "pg") ==
      x64("c##n##s##K##op##pg########"))
    // http branch
    assert(fp("c", "n", "s", "K", "op", meth = "GET", tmpl = "/u/{id}") ==
      x64("c##n##s##K##GET##/u/{id}"))
  }
}
