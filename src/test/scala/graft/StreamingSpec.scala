package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingIngest

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming 10s pre-agg over a file source equals the batch pre-agg") {
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("event_id"), col("ts_ms"), col("event_type"), col("value"))
    val dir = Files.createTempDirectory("graft_stream_").toString
    ev.write.mode("overwrite").parquet(dir)

    val out = StreamingIngest.runFileStreamOnce(spark, dir, ev.schema,
      src => StreamingIngest.preAggStream(src, col("ts_ms"), lit("events_value"),
        col("value"), Seq("attr_event_type" -> col("event_type"))),
      queryName = "stream_preagg")

    val batch = ev
      .groupBy((col("ts_ms") - col("ts_ms") % 10000L).as("chq_timestamp"),
        col("event_type").as("attr_event_type"))
      .agg(sum(col("value")).as("bsum"), count(lit(1)).cast("double").as("bcnt"))

    val j = out.join(batch, Seq("chq_timestamp", "attr_event_type"), "full")
    val bad = j.filter(col("chq_rollup_sum").isNull || col("bsum").isNull ||
      abs(col("chq_rollup_sum") - col("bsum")) > 1e-6 ||
      col("chq_rollup_count") =!= col("bcnt")).count()
    assert(bad == 0)
    assert(out.count() > 0)
  }
}
