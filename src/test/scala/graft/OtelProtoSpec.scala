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
          "payment ok", Seq("http.method" -> "GET"))))

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
    // second record has no `retries` attr → null (dynamic-schema union)
    val ok = df.filter(org.apache.spark.sql.functions.col("log_level") === "INFO").head()
    assert(ok.getAs[String]("attr_retries") == null)
  }
}
