package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession settings for the graft engine.
  *
  * Centralized so Verify / Bench / tests / library users agree on:
  *  - UTC session time zone (oracle parity with DuckDB),
  *  - shuffle partitions sized for the local[N] harness (a real cluster
  *    deployment overrides via spark-defaults; AQE coalesces at runtime),
  *  - nanosAsLong so parquet TIMESTAMP(NANOS) inputs (events.ts) load as
  *    LongType ns instead of failing (Spark 4 has no native ns type),
  *  - AQE on: runtime shuffle-partition coalescing + skew-join splitting,
  *    which is what makes the same plans survive a 100x scale-up.
  */
object GraftSession {
  def builder(master: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      // graft's native expressions (ddsketch_*, graft_dot) in SQL text
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // reference semantics: bad casts → NULL (DuckDB try_cast), no ANSI
      // arithmetic errors mid-pipeline
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
