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
    * pruning needs the file list. `owner` pins the SESSION the DataFrame
    * was built by: the key carries only the session's identityHashCode,
    * which the JVM can reuse after the original session is collected —
    * without the reference-identity check a later session sharing the
    * hash would be served a plan bound to a stopped session. Weak, so the
    * cache never keeps a dead session (and its plans) alive.
    */
  private final class Entry(val expiresAtNanos: Long,
      val owner: java.lang.ref.WeakReference[SparkSession],
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

  /** drop every cached listing — the swap-retry path for a serving layer
    * that does not know which of a request's dirs went stale (the cache
    * rebuilds at one LIST per dir, so a rare whole-cache drop is cheap)
    */
  def invalidateAll(): Unit = cache.clear()

  private def load(spark: SparkSession, dir: String, mergeSchema: Boolean,
      swallowMissing: Boolean): Entry = {
    val ttl = ttlMs(spark)
    val key = (System.identityHashCode(spark), dirKey(dir), mergeSchema)
    val now = System.nanoTime()
    if (ttl > 0) {
      val hit = cache.get(key)
      if (hit != null && hit.expiresAtNanos > now &&
          (hit.owner.get eq spark) &&
          (hit.df.isDefined || swallowMissing)) return hit
      // bound growth across many short-lived sessions (test suites): drop
      // expired and orphaned entries once the map is past a nominal size
      if (cache.size > 512)
        cache.values.removeIf(e => e.expiresAtNanos <= now || e.owner.get == null)
    }
    listings.incrementAndGet()
    val reader =
      if (mergeSchema) spark.read.option("mergeSchema", "true")
      else spark.read
    // the listing holds the dir's swap READ lock: a same-JVM compaction
    // swap (write side) can never interleave its missing-dir window here
    def list(): Option[DataFrame] =
      withSwapReadLock(dir) {
        if (swallowMissing)
          try Some(reader.parquet(dir))
          catch { case _: org.apache.spark.sql.AnalysisException => None }
        else Some(reader.parquet(dir))
      }
    val df =
      try list()
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          // path absent: a crashed (or cross-process mid-flight) swap
          // leaves the data staged in .compact_old — restore and retry
          // once; a genuinely missing store rethrows as before
          recoverStaged(spark, dir)
          try list() catch { case _: Throwable => throw e }
      }
    val e = new Entry(now + ttl * 1000000L,
      new java.lang.ref.WeakReference(spark), df)
    // a positive entry may overwrite a cached miss (tryRead after the
    // path appeared); a miss is cached too — the no-index probe must not
    // cost a LIST per query either
    if (ttl > 0) cache.put(key, e)
    e
  }

  /** test hook: clear every cached entry's owner ref — simulates the JVM
    * reusing a collected session's identityHashCode for a NEW session
    * object (the collision the reference-identity check on hit guards).
    */
  private[graft] def orphanOwnersForTest(): Unit =
    cache.values.forEach(_.owner.clear())

  // ----------------------------------------------------- compaction swaps
  // The compactor's two-rename swap (Segments.compactWithSwap) has a
  // window where the live dir is briefly absent. The reference never has
  // this problem: its segments are immutable S3 objects and readers pick
  // a consistent set from the PG index (lrdb/queries/metric_seg.sql), so
  // compaction registers new files and retires old ones without a gap. A
  // filesystem store needs two mitigations instead:
  //  - same-JVM: a per-dir read/write lock — the compactor holds the
  //    write side across its rename pair (microseconds), listings hold
  //    the read side, so an in-process reader can never observe the
  //    missing-dir window;
  //  - cross-process (or crashed compactor): a listing that finds the
  //    dir absent while `<dir>.compact_old` exists waits briefly for the
  //    swap to land, then restores the staged dir (the reader-side twin
  //    of Segments.recoverStagedSwap) and retries.

  private val swapLocks = new ConcurrentHashMap[String,
    java.util.concurrent.locks.ReentrantReadWriteLock]()
  private def lockFor(dir: String) =
    swapLocks.computeIfAbsent(dirKey(dir),
      _ => new java.util.concurrent.locks.ReentrantReadWriteLock())

  /** held by [[graft.ingest.Segments.compactWithSwap]] around its rename
    * pair so same-JVM listings never race the swap window
    */
  private[graft] def withSwapWriteLock[T](dir: String)(body: => T): T = {
    val l = lockFor(dir).writeLock(); l.lock()
    try body finally l.unlock()
  }

  /** held around filesystem METADATA reads of `dir` too (TierFreshness's
    * partition globs): a glob landing in the rename window would silently
    * return zero partitions — degrading the fresh door to a wrong tier
    * condition, worse than an error — so metadata readers exclude the
    * same-JVM window exactly like listings do.
    */
  private[api] def withSwapReadLock[T](dir: String)(body: => T): T = {
    val l = lockFor(dir).readLock(); l.lock()
    try body finally l.unlock()
  }

  /** true when `t`'s failure is a planned-file-snapshot invalidation — a
    * compaction swap (or an equivalent rewrite) replaced files between an
    * action's planning and its execution: a FileNotFoundException anywhere
    * in the cause chain, or Spark's own stale-snapshot diagnosis.
    */
  def isVanishedSnapshot(t: Throwable): Boolean = {
    val seen = scala.collection.mutable.Set[Throwable]()
    def walk(e: Throwable): Boolean =
      e != null && seen.add(e) && {
        e.isInstanceOf[java.io.FileNotFoundException] ||
        Option(e.getMessage).exists(m =>
          m.contains("FileNotFoundException") ||
          m.contains("PATH_NOT_FOUND") ||
          m.contains("underlying files have been updated")) ||
        walk(e.getCause) || e.getSuppressed.exists(walk)
      }
    walk(t)
  }

  /** Run a door action (the terminal collect/write over scans of `dirs`),
    * retrying ONCE when a concurrent compaction invalidated the planned
    * file snapshot mid-flight: the retry drops the cached listings and
    * re-plans against the post-swap store. This is the serving-layer
    * analog of the reference re-resolving its segment set from the index
    * on the next request — without it, a request racing a compaction
    * surfaces a spurious 500 for data that never stopped existing.
    *
    * `action` MUST rebuild its DataFrames from the doors (which list via
    * this cache) rather than re-collecting a captured frame — a captured
    * frame pins the pre-swap file snapshot and would fail identically.
    * Empty `dirs` drops every cached listing (serving-layer form: the
    * route doesn't know which of a request's dirs went stale).
    */
  def withSwapRetry[T](spark: SparkSession, dirs: Seq[String])(
      action: => T): T =
    try action catch {
      case t: Throwable if isVanishedSnapshot(t) =>
        if (dirs.isEmpty) {
          invalidateAll()
          TierFreshness.invalidateAllMeta()
        } else dirs.foreach { d =>
          invalidate(d)
          TierFreshness.invalidateMeta(d)
          recoverStaged(spark, d)
        }
        action
    }

  /** reader-side staged-swap recovery: if `dir` is absent but the
    * compactor's staged `.compact_old` exists, wait briefly for an
    * in-flight cross-process swap to land; if the dir is STILL missing the
    * compactor is dead — restore the staged data (same contract as
    * [[graft.ingest.Segments.recoverStagedSwap]], duplicated here so the
    * read path owns its recovery without an ingest-module call).
    */
  private[api] def recoverStaged(spark: SparkSession, dir: String): Unit = {
    val dirP = new org.apache.hadoop.fs.Path(dirKey(dir))
    val fs = dirP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldP = new org.apache.hadoop.fs.Path(dirKey(dir) + ".compact_old")
    try {
      if (fs.exists(dirP) || !fs.exists(oldP)) return
      var waited = 0
      while (!fs.exists(dirP) && fs.exists(oldP) && waited < 2000) {
        Thread.sleep(50); waited += 50
      }
      if (!fs.exists(dirP) && fs.exists(oldP)) fs.rename(oldP, dirP)
    } catch { case _: java.io.IOException => () }
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
