package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for training-data pipelines: the batch
  * [[graft.ops.Dedup.exact]] contract (normalized-content fingerprint,
  * keep one doc per fingerprint) on an unbounded stream.
  *
  * `dropDuplicatesWithinWatermark` keeps state ONLY for the watermark
  * window — the property that makes this runnable forever: a full-history
  * `dropDuplicates` would grow state with every distinct document, while
  * the watermark bound matches how dup-heavy crawl streams actually
  * arrive (re-crawls and mirrors cluster in time). Docs whose duplicate
  * arrives outside the window are emitted again — downstream batch dedup
  * (the nightly [[graft.ops.Dedup]] pass) catches those, so the stream
  * stage is a high-recall prefilter with bounded memory, not the only
  * gate.
  *
  * Keep-first is ARRIVAL order (streaming has no global min-id order; the
  * batch pass imposes one when it matters).
  */
object StreamingDedup {

  /** the same normalization [[graft.ops.Dedup.exact]] fingerprints on */
  def contentFingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), " +", " "))

  /** raw doc stream → stream with exact dups (within the watermark window)
    * dropped. `tsCol` must be a TimestampType event-time column.
    */
  def dedupStream(stream: DataFrame, textCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    stream
      .withColumn("__fp", contentFingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Per-ROW MinHash signature — no shuffle, no aggregation: shingle
    * array → one md5 base hash per shingle → k affine min-folds, all
    * inside a single projection. Semantically identical to
    * [[graft.ops.Dedup.minhash]] (same base hash, same affine family,
    * same mins); the batch path keeps the explode→groupBy form for
    * map-side combine, the streaming path NEEDS the per-row form because
    * a streaming groupBy is stateful. Docs with no shingles yield null.
    */
  def rowSignature(text: Column, k: Int = 16, w: Int = 5): Column =
    // ONE native fused pass ([[graft.ops.MinHashSig]]): per distinct
    // shingle one md5 and k integer lane updates — the earlier
    // single-aggregate HOF fold had the right work shape but still
    // re-entered the interpreted evaluator per shingle × k lanes (8.9 s
    // task-CPU on the sf0.1 screen row; ~1 s fused). Identical hash
    // family and null-on-no-shingles semantics; the batch explode→groupBy
    // path and every DuckDB oracle replay are unchanged.
    graft.ops.MinHashSig.sig(text, k, w)

  /** banded signatures of the STATIC reference corpus — precompute once
    * (or load from the signature store a batch job maintains) and hand to
    * [[nearDupAgainst]]. Reference buckets above `maxDocsPerBucket` are
    * dropped ([[graft.ops.Dedup.capBuckets]]): the stream side is per-row
    * and can't be grouped without state, so bounding the REFERENCE side
    * bounds the join's expansion per stream row at cap × bands.
    */
  def bandedReference(existing: DataFrame, textCol: String, k: Int = 16,
      bands: Int = 4, w: Int = 5, maxDocsPerBucket: Int = 1000): DataFrame =
    bandSigs(graft.ops.Dedup.minhash(existing, textCol, k, w),
      k, bands, maxDocsPerBucket)

  /** [[bandedReference]] with the signatures served from a persisted
    * [[graft.ops.SignatureStore]] instead of recomputed per refresh —
    * the 100 TB reference side: stored signatures cover docs up to the
    * store's watermark, and existing docs ABOVE it (corpus arrivals
    * since the last store write) get a fresh signature pass, the
    * store's documented staleness rule. The banded output is identical
    * to [[bandedReference]] over the same corpus (signatures are
    * deterministic per doc), so a screen restarted against a new corpus
    * snapshot only ever hashes the delta. k/w come from the store meta.
    */
  def bandedReferenceFromStore(spark: org.apache.spark.sql.SparkSession,
      existing: DataFrame, textCol: String, dir: String, bands: Int = 4,
      maxDocsPerBucket: Int = 1000): DataFrame = {
    // shared staleness-rule helper; the fresh delta arrives MATERIALIZED
    // so the stream-static join doesn't re-hash it per micro-batch
    val (sigs, meta) =
      graft.ops.SignatureStore.sigsWithDelta(existing, textCol, dir)
    // materialize the WHOLE banded reference too (r18): the static side
    // of a stream-static join re-executes per micro-batch, so the store
    // read + band explode + hot-bucket cap all re-ran every trigger
    // (3 batches ≈ 3× the reference work, measured ~40 s task-CPU at
    // sf0.1). The reference is fixed for the lifetime of the query by
    // contract (refresh = restart against a new snapshot), so one
    // materialized pass is semantics-preserving.
    graft.GraftSession.materialize(
      bandSigs(sigs, meta.k, bands, maxDocsPerBucket))
  }

  /** (doc_id, sig) → capped banded reference (shared tail of both
    * reference builders)
    */
  private def bandSigs(sigs: DataFrame, k: Int, bands: Int,
      maxDocsPerBucket: Int): DataFrame = {
    val rows = k / bands
    graft.ops.Dedup.capBuckets(
      sigs
        .select(col("doc_id").as("ref_id"), col("sig").as("ref_sig"),
          explode(array((0 until bands).map { b =>
            struct(lit(b).as("band"),
              md5(array_join(slice(col("sig"), b * rows + 1, rows), ","))
                .as("bucket"))
          }: _*)).as("bb"))
        .select(col("ref_id"), col("ref_sig"), col("bb.band"), col("bb.bucket")),
      maxDocsPerBucket)
  }

  /** Streaming near-dup screen against a static corpus — the streaming
    * twin of [[graft.ops.Dedup.incrementalDedup]]: every micro-batch doc
    * is signature-banded PER ROW (no shuffle, no state) and equi-joined
    * against the banded reference — a stream-static join Structured
    * Streaming executes incrementally. ZERO streaming state (unlike the
    * watermark dedup): each decision is row-vs-reference, so arbitrarily
    * long streams never grow memory; the reference refreshes by restarting
    * the query against a new snapshot. Emits one row per (incoming doc,
    * matching reference doc, SHARED BAND) with est_sim ≥ threshold — a
    * pair matching in several bands appears once per band (bounded by
    * `bands`), because collapsing them would be a streaming aggregation
    * and thus state; the consumer's distinct/anti-join is a batch-side
    * one-liner. The same function runs on a batch frame (a non-streaming
    * `stream` input) — stream/batch parity is spec-gated on exactly that.
    */
  def nearDupAgainst(stream: DataFrame, reference: DataFrame, textCol: String,
      k: Int = 16, bands: Int = 4, w: Int = 5,
      threshold: Double = 0.5): DataFrame = {
    val rows = k / bands
    val sig = rowSignature(col(textCol), k, w)
    val banded = stream
      .withColumn("__sig", sig)
      .filter(col("__sig").isNotNull)
      .select(col("doc_id").as("new_id"), col("__sig"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            md5(array_join(slice(col("__sig"), b * rows + 1, rows), ","))
              .as("bucket"))
        }: _*)).as("bb"))
      .select(col("new_id"), col("__sig"), col("bb.band"), col("bb.bucket"))
    val eq = size(filter(zip_with(col("__sig"), col("ref_sig"),
      (x, y) => when(x === y, 1).otherwise(0)), v => v === 1))
    banded.join(reference, Seq("band", "bucket"))
      .withColumn("est_sim", eq.cast("double") / lit(k.toDouble))
      .filter(col("est_sim") >= threshold && col("new_id") =!= col("ref_id"))
      .select(col("new_id"), col("ref_id"), col("band"), col("est_sim"))
  }
}
