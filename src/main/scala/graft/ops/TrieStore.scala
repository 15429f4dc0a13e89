package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Durable snapshots of fingerprint-trie cluster state — a graft
  * EXTENSION past the reference: its TrieClusterManager is
  * process-lifetime-only (tenant_manager.go holds tries in a sync.Map;
  * a collector restart re-mints cluster ids for every re-seen
  * template). Long-running streaming ingest wants ids that survive
  * restarts, so this store persists exactly the fields the reference's
  * own cluster struct declares serializable
  * (trie_cluster_manager.go:28-34 json tags: fp, token set, match
  * count, total) plus the trie PATH that locates each leaf.
  *
  * Layout: `dir/gen-%09d/` parquet generations — write-once, newest
  * complete generation wins, the same crash-safe pointer discipline as
  * the IVF index (a half-written generation has no _SUCCESS and is
  * ignored; the previous generation keeps serving). `save` sweeps all
  * but the two newest complete generations. State volume is
  * O(tenants × templates) — the same bound as the in-memory trie.
  */
object TrieStore {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def completeGens(spark: SparkSession, dir: String): Seq[Path] = {
    val f = fs(spark, dir)
    val root = new Path(dir)
    if (!f.exists(root)) return Nil
    f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen-"))
      .filter(s => f.exists(new Path(s.getPath, "_SUCCESS")))
      .sortBy(_.getPath.getName)
      .map(_.getPath)
  }

  /** persist every tenant's full trie state as generation `gen` */
  def save(spark: SparkSession, registry: FingerprintCompat.TenantRegistry,
      dir: String, gen: Long): Unit = {
    import spark.implicits._
    val rows = registry.orgIds.flatMap { org =>
      registry.tenant(org).snapshot().flatMap { case (path, clusters) =>
        clusters.zipWithIndex.map { case ((fp, tokens, mc, tot), idx) =>
          (org, path, idx, fp, tokens.toSeq.sorted, mc, tot)
        }
      }
    }
    val out = f"$dir/gen-$gen%09d"
    rows.toDF("org", "path", "cluster_idx", "fp", "tokens",
        "match_count", "total")
      .coalesce(1)
      .write.mode("overwrite").parquet(out)
    // sweep: keep the two newest complete generations
    val gens = completeGens(spark, dir)
    gens.dropRight(2).foreach(p => fs(spark, dir).delete(p, true))
  }

  /** rebuild a registry from the newest complete generation (empty
    * registry if none); returns the generation loaded, -1 when fresh
    */
  def load(spark: SparkSession, dir: String,
      registry: FingerprintCompat.TenantRegistry): Long = {
    val gens = completeGens(spark, dir)
    if (gens.isEmpty) return -1L
    val newest = gens.last
    val df = spark.read.parquet(newest.toString)
      .orderBy(col("org"), col("path"), col("cluster_idx"))
    // template-bounded by construction; group leaf rows driver-side
    val rows = df.select("org", "path", "cluster_idx", "fp", "tokens",
        "match_count", "total").collect()
    rows.groupBy(r => (r.getString(0), r.getSeq[String](1)))
      .foreach { case ((org, path), leafRows) =>
        val clusters = leafRows.sortBy(_.getInt(2)).map { r =>
          (r.getLong(3), r.getSeq[String](4).toSet, r.getInt(5), r.getInt(6))
        }.toSeq
        registry.tenant(org).restoreLeaf(path, clusters)
      }
    newest.getName.stripPrefix("gen-").toLong
  }
}
