package graft.api

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TTL-bounded cache of segment-directory scan DataFrames — the
  * scan-listing twin of [[TierFreshness]]'s metadata cache.
  *
  * Every `spark.read.parquet(dir)` constructs a fresh file index: a
  * recursive LIST of the whole store plus (under mergeSchema) a footer
  * read per file. The query doors pay that per REQUEST — and the sliced
  * SSE path per SLICE — where the reference pays one indexed PG lookup
  * (lrdb/queries/metric_seg.sql:113-125, log_seg.sql). On local/HDFS the
  * listing is cheap; on an S3 store with years of `dateint=` partitions
  * it is the dominant planning cost and an object-store LIST per
  * keystroke of dashboard autocomplete.
  *
  * A DataFrame is an immutable logical plan over the file snapshot taken
  * at construction, so reusing one across requests is exactly what
  * Spark's own catalog tables do with their shared InMemoryFileIndex —
  * this cache gives path-based reads the same property, bounded by a
  * short TTL. Staleness contract (same shape as the freshness metadata
  * cache): in-process writers invalidate their dir through
  * [[TierFreshness.invalidateMeta]] (segment writers, compaction,
  * retention expiry, index builds), so one JVM always reads its own
  * writes; cross-process new segments become visible within the TTL —
  * well inside the ingest-to-queryable cadence the reference's
  * registration pipeline also has. A cached snapshot can also reference
  * files a CONCURRENT compaction just deleted; the swap protocol keeps
  * the window to the TTL and `spark.sql.files.ignoreMissingFiles` is the
  * standard object-store mitigation (the reference has the same
  * index-vs-store window between PG registration and S3 delete).
  *
  * Keyed per (session, dir, mergeSchema): a DataFrame belongs to the
  * session that built it, so entries never leak across sessions; TTL 0
  * (`spark.graft.scan.listTtlMs`) disables caching entirely — every call
  * lists afresh, the pre-r18 behavior, for tests that mutate stores
  * behind the writer APIs' back.
  */
object ScanCache {

  /** session conf key: TTL in ms for cached directory listings.
    * 0 disables (every read constructs a fresh file index).
    */
  val TtlKey = "spark.graft.scan.listTtlMs"

  private def ttlMs(spark: SparkSession): Long =
    spark.conf.getOption(TtlKey).flatMap(_.toLongOption).getOrElse(30000L)

  /** `df` is None only for a cached MISS (path absent / unreadable) from
    * [[tryRead]] — the index-probe path, where "no index" is as cacheable
    * as the index itself. `files` materializes lazily: only exclusion
    * pruning needs the file list.
    */
  private final class Entry(val expiresAtNanos: Long,
      val df: Option[DataFrame]) {
    lazy val files: Array[String] = df.map(_.inputFiles).getOrElse(Array.empty)
  }

  private val cache =
    new ConcurrentHashMap[(Int, String, Boolean), Entry]()
  // fresh file-index constructions actually performed — the spec gate
  // counts these across repeated door queries to pin ≤ one LIST per
  // (dir, TTL window)
  private val listings = new AtomicLong(0L)
  def listingCount: Long = listings.get()

  private def dirKey(dir: String): String = dir.stripSuffix("/")

  /** drop every cached listing touching `dir` (or a parent/child — the
    * streaming writer lands batches in subdirs while readers key the
    * root). Fanned out from [[TierFreshness.invalidateMeta]] so every
    * existing writer hook covers both caches.
    */
  def invalidate(dir: String): Unit = {
    val d = dirKey(dir)
    def related(k: String) =
      k == d || k.startsWith(d + "/") || d.startsWith(k + "/")
    cache.keySet.removeIf(k => related(k._2))
  }

  private def load(spark: SparkSession, dir: String, mergeSchema: Boolean,
      swallowMissing: Boolean): Entry = {
    val ttl = ttlMs(spark)
    val key = (System.identityHashCode(spark), dirKey(dir), mergeSchema)
    val now = System.nanoTime()
    if (ttl > 0) {
      val hit = cache.get(key)
      if (hit != null && hit.expiresAtNanos > now &&
          (hit.df.isDefined || swallowMissing)) return hit
    }
    listings.incrementAndGet()
    val reader =
      if (mergeSchema) spark.read.option("mergeSchema", "true")
      else spark.read
    val df =
      if (swallowMissing)
        try Some(reader.parquet(dir))
        catch { case _: org.apache.spark.sql.AnalysisException => None }
      else Some(reader.parquet(dir))
    val e = new Entry(now + ttl * 1000000L, df)
    // a positive entry may overwrite a cached miss (tryRead after the
    // path appeared); a miss is cached too — the no-index probe must not
    // cost a LIST per query either
    if (ttl > 0) cache.put(key, e)
    e
  }

  /** `spark.read[.option(mergeSchema)].parquet(dir)`, served from the
    * cache when fresh. Throws like the underlying read when the path is
    * missing — failures are never cached (a store created a moment later
    * must not inherit a 30 s blind spot).
    */
  def read(spark: SparkSession, dir: String,
      mergeSchema: Boolean = false): DataFrame =
    load(spark, dir, mergeSchema, swallowMissing = false).df.get

  /** [[read]] returning None when the path is absent/unreadable — the
    * index-probe form. The miss IS cached (TTL-bounded): an index that
    * appears later becomes visible on expiry or on the builder's
    * invalidation.
    */
  def tryRead(spark: SparkSession, dir: String,
      mergeSchema: Boolean = false): Option[DataFrame] =
    load(spark, dir, mergeSchema, swallowMissing = true).df

  /** the cached scan's resolved file list (lazy per entry) — what
    * exclusion pruning intersects against instead of calling
    * `DataFrame.inputFiles` per query.
    */
  def inputFiles(spark: SparkSession, dir: String,
      mergeSchema: Boolean = false): Array[String] =
    load(spark, dir, mergeSchema, swallowMissing = false).files
}
