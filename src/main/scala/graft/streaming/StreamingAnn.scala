package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ANN probes against a persisted IVF index
  * ([[graft.ops.Similarity.buildIvfIndex]]) — the serving shape where a
  * query STREAM (user requests, fresh documents needing neighbors)
  * probes a write-once index: each micro-batch runs the same
  * partition-pruned probe the batch front door uses
  * ([[graft.ops.Similarity.ivfTopKFromIndex]]) via foreachBatch — the
  * probe needs a window rank and a driver-side centroid statistic, both
  * batch-context operations, and per-query top-k is independent of how
  * queries batch, so the streamed union equals the one-shot batch
  * answer row for row (StreamingSpec pins exactly that; the catalog row
  * reuses the ivf oracle verbatim). ZERO streaming state: each decision
  * is query-vs-index, so arbitrarily long probe streams never grow
  * memory; index refreshes (append / [[graft.ops.Similarity.maintainIvfIndex]]
  * re-cluster) land between micro-batches as new list files.
  */
object StreamingAnn {

  /** stream of (vec_id, embedding) probes → per-batch top-k parquet under
    * `outDir/probe_batch=<id>` (delete-then-rewrite per batch dir: the
    * same per-dir exactly-once contract as the streaming segment sink)
    */
  def probeStream(queries: DataFrame, indexDir: String, outDir: String,
      checkpointDir: String, k: Int = 10, nProbe: Int = 4): StreamingQuery =
    queries.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val dir = s"$outDir/probe_batch=$batchId"
          val p = new org.apache.hadoop.fs.Path(dir)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(p, true)
          graft.ops.Similarity
            .ivfTopKFromIndex(spark, indexDir, batch, k, nProbe)
            .write.mode("overwrite").parquet(dir)
        }
        ()
      }
      .start()
}
