package graft.ops

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-once persisted MinHash signature store — the 100 TB shape for
  * incremental dedup refreshes. [[Dedup.incrementalDedup]] recomputes the
  * EXISTING corpus's signatures on every refresh; that is fine when the
  * catalog row must be self-contained, but at scale the existing side is
  * the accumulated training set and its signatures are a small,
  * append-only derivative that belongs on disk next to the data — the
  * same pattern as the segment fingerprint index
  * ([[graft.ingest.FingerprintIndex]]): write once at ingest, read many
  * at query time.
  *
  * Layout under `dir`:
  *  - `sigs.parquet` — (doc_id: long, sig: array<long>) via
  *    [[Dedup.minhash]] (docs with no shingles have no row, exactly like
  *    the recompute path)
  *  - `meta.json` — `{"k":…,"w":…,"watermark":…}`; `watermark` is the max
  *    doc_id of the corpus AT WRITE TIME (of the corpus, not of the
  *    signature rows, so shingle-free tail docs don't re-scan forever)
  *
  * Staleness rule (documented contract): a refresh reads stored
  * signatures for docs with `doc_id <= watermark` and ALWAYS scans docs
  * newer than the watermark fresh — new corpus arrivals since the last
  * signature write are never silently unmatched, at the cost of one
  * signature pass over just the delta. Re-running [[write]] after an
  * append advances the watermark and shrinks the next delta to zero.
  */
object SignatureStore {

  final case class Meta(k: Int, w: Int, watermark: Long)

  /** Build (or rebuild) the store for `corpus`. Returns the meta written. */
  def write(corpus: DataFrame, textCol: String, dir: String,
      k: Int = 16, w: Int = 5): Meta = {
    Dedup.minhash(corpus, textCol, k, w)
      .write.mode("overwrite").parquet(s"$dir/sigs.parquet")
    val wmRow = corpus.agg(max(col("doc_id"))).head()
    val wm = if (wmRow.isNullAt(0)) Long.MinValue else wmRow.getLong(0)
    val meta = Meta(k, w, wm)
    Files.write(Paths.get(dir, "meta.json"),
      s"""{"k":$k,"w":$w,"watermark":$wm}""".getBytes(UTF_8))
    meta
  }

  def readMeta(dir: String): Meta = {
    val txt = new String(Files.readAllBytes(Paths.get(dir, "meta.json")), UTF_8)
    def field(name: String): Long = {
      val m = s""""$name":(-?\\d+)""".r.findFirstMatchIn(txt)
      m.getOrElse(sys.error(s"SignatureStore: no '$name' in $dir/meta.json"))
        .group(1).toLong
    }
    Meta(field("k").toInt, field("w").toInt, field("watermark"))
  }

  def readSigs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/sigs.parquet").select(col("doc_id"), col("sig"))

  /** The staleness rule as one shared helper: stored signatures cover
    * `doc_id <= watermark`, existing docs ABOVE it (corpus arrivals
    * since the last [[write]]) get a fresh signature pass. The fresh
    * delta is MATERIALIZED once — both the batch refresh's capBuckets
    * consumers and the streaming screen's per-micro-batch static side
    * would otherwise recompute the shingle+hash pass per consumer.
    * Returns (store-served ∪ fresh signatures, store meta).
    */
  def sigsWithDelta(existing: DataFrame, textCol: String,
      dir: String): (DataFrame, Meta) = {
    val meta = readMeta(dir)
    val stored = readSigs(existing.sparkSession, dir)
    val fresh = graft.GraftSession.materialize(
      Dedup.minhash(existing.filter(col("doc_id") > meta.watermark),
        textCol, meta.k, meta.w))
    (stored.unionByName(fresh), meta)
  }

  /** [[Dedup.incrementalDedup]] with the existing side served from the
    * store: stored signatures cover `doc_id <= watermark`, and existing
    * docs ABOVE the watermark (arrivals since the last [[write]]) get a
    * fresh signature pass — the staleness rule. Result is IDENTICAL to
    * the full recompute (the `pp_incremental_persist` catalog row gates
    * this against the recompute oracle verbatim); `existing` must be the
    * same corpus the store was built from plus any appends, k/w come from
    * the store's meta.
    */
  def incrementalDedup(existing: DataFrame, incoming: DataFrame,
      textCol: String, dir: String, bands: Int = 4, threshold: Double = 0.5,
      maxDocsPerBucket: Int = 1000): DataFrame = {
    // stored rides its parquet files (re-read beats re-hash); only the
    // fresh delta — recomputed by both capBuckets consumers otherwise —
    // is worth pinning (sigsWithDelta does exactly that)
    val (lSigs, meta) = sigsWithDelta(existing, textCol, dir)
    Dedup.incrementalDedupFromSigs(
      lSigs,
      graft.GraftSession.materialize(
        Dedup.minhash(incoming, textCol, meta.k, meta.w)),
      meta.k, bands, threshold, maxDocsPerBucket)
  }
}
