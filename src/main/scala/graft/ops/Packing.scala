package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Chunking and sequence packing — the last prep steps before training
  * batches are cut from a curated corpus.
  *
  * Scale design: chunking is a pure per-row projection (explode of a
  * bounded per-doc chunk list). Packing is a running token sum WITHIN a
  * stratum (window partitioned by the stratum key — training pipelines
  * pack within shards/sources anyway), so no global single-task window
  * exists anywhere; parallelism = stratum count.
  *
  * Determinism: chunk boundaries are pure word-index arithmetic; pack
  * bins come from an integer prefix sum over the (stratum, doc_id) order —
  * both replay bit-for-bit in any engine.
  */
object Packing {

  /** Split text into overlapping word-window chunks: windows of `maxWords`
    * advancing by `maxWords - overlap`. Returns one row per chunk with
    * `chunk_idx` (0-based) and `chunk_text`; a doc shorter than one window
    * yields exactly its full text as chunk 0. The per-doc chunk list is
    * bounded by words/(maxWords-overlap) — explode, not a join.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      maxWords: Int = 512, overlap: Int = 64): DataFrame = {
    require(overlap < maxWords, "overlap must be smaller than the window")
    val stepW = maxWords - overlap
    val words = split(df(textCol), " +")
    val n = size(words)
    // window starts: 1, 1+step, … while start ≤ n (1-based slice). A
    // trailing window that only re-covers the previous one's overlap is
    // dropped: keep s = 1 (always) or windows with ≥1 NEW word beyond the
    // overlap (s + overlap ≤ n) — an index-free rule any engine replays.
    val starts = filter(sequence(lit(1), greatest(n, lit(1)), lit(stepW)),
      s => s === 1 || s + lit(overlap) <= n)
    val chunks = transform(starts,
      s => array_join(slice(words, s, lit(maxWords)), " "))
    df.select(df(idCol), posexplode(chunks).as(Seq("chunk_idx", "chunk_text")))
  }

  /** Greedy in-order sequence packing within each stratum: docs (whole)
    * are assigned to bins by the running token count — bin k covers the
    * cumulative range [k·seqLen, (k+1)·seqLen). One shuffle on the stratum
    * key; the window is partitioned, never global.
    */
  def packBins(df: DataFrame, stratumCol: String, idCol: String,
      tokensCol: String, seqLen: Long): DataFrame = {
    val w = Window.partitionBy(df(stratumCol)).orderBy(df(idCol))
    val running = sum(df(tokensCol)).over(w)
    df.withColumn("pack_bin",
      floor((running - df(tokensCol)) / lit(seqLen.toDouble)).cast("long"))
  }

  /** Per-sequence boundary manifest — the artifact a training job needs
    * from a packer: for every (stratum, bin), the ordered list of
    * (doc id, start offset within the sequence, token length) as a
    * compact `id:off:len|…` string, so attention masks and loss
    * boundaries reconstruct without re-reading the corpus. Offsets are
    * the same running sum [[packBins]] derives bins from (off =
    * running − tokens − bin·seqLen); collect_list is bounded by docs
    * per bin and array_sort restores offset order, so the digest never
    * depends on shuffle arrival order.
    */
  def packBoundaries(df: DataFrame, stratumCol: String, idCol: String,
      tokensCol: String, seqLen: Long): DataFrame = {
    val w = Window.partitionBy(df(stratumCol)).orderBy(df(idCol))
    val running = sum(df(tokensCol)).over(w)
    val bin = floor((running - df(tokensCol)) / lit(seqLen.toDouble)).cast("long")
    val off = (running - df(tokensCol)) - bin * seqLen
    df.withColumn("pack_bin", bin)
      .withColumn("__off", off.cast("long"))
      .groupBy(col(stratumCol), col("pack_bin"))
      .agg(count(lit(1)).as("n_docs"),
        array_join(transform(
          array_sort(collect_list(struct(col("__off").as("o"),
            df(idCol).as("id"), df(tokensCol).cast("long").as("n")))),
          m => concat_ws(":", m.getField("id").cast("string"),
            m.getField("o").cast("string"), m.getField("n").cast("string"))),
          "|").as("boundaries"))
  }

  /** pack summary: docs and token totals per (stratum, bin) */
  def packSummary(df: DataFrame, stratumCol: String, idCol: String,
      tokensCol: String, seqLen: Long): DataFrame =
    packBins(df, stratumCol, idCol, tokensCol, seqLen)
      .groupBy(col(stratumCol), col("pack_bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).as("n_tokens"))

  /** Training-shard export manifest: rows in deterministic
    * [[Sampling.globalShuffle]] order are cut into fixed-`shardSize`
    * shards; one manifest row per shard carries counts, the pos range,
    * byte totals, and an ORDER-SENSITIVE id digest (md5 of the comma-join
    * in pos order) — the artifact a training job checks to prove it read
    * exactly the intended rows in the intended order. A shard writer
    * partitionBy("shard_id") consumes the same assignment; the manifest is
    * the verifiable half, so it is what the catalog oracles.
    *
    * Scale shape: globalShuffle's one range sort, then a groupBy on
    * shard_id (rows/shardSize groups). collect_list is bounded by
    * shardSize per group — a constant chosen to fit a training file, not a
    * corpus-sized aggregation; array_sort restores pos order inside the
    * group so the digest never depends on shuffle arrival order.
    */
  def shardManifest(df: DataFrame, idCol: String, textCol: String,
      seed: Int, shardSize: Int): DataFrame = {
    val shuffled = Sampling.globalShuffle(
      df.select(graft.GraftSession.safeCol(df, idCol),
        graft.GraftSession.safeCol(df, textCol)), idCol, seed)
    shuffled
      .withColumn("shard_id", expr(s"pos div $shardSize"))
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("pos")).as("min_pos"),
        max(col("pos")).as("max_pos"),
        sum(octet_length(graft.GraftSession.safeCol(df, textCol)).cast("long"))
          .as("text_bytes"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos").as("p"),
            graft.GraftSession.safeCol(df, idCol).as("id")))),
          m => m.getField("id").cast("string")), ",")).as("ids_digest"))
  }
}
