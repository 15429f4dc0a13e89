package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-style scoring and benchmark-contamination screening for
  * training-data curation.
  *
  * Scale design: corpus-side work is explode → broadcast-join → one per-doc
  * aggregation. The benchmark / query-term side is always the small relation
  * and rides a broadcast; corpus-wide statistics (document frequency, avgdl)
  * reduce to a handful of rows and broadcast back. No corpus self-join
  * anywhere, so the shape survives 100 TB.
  *
  * Cross-engine determinism: per-(doc, term) contributions are summed in a
  * FIXED expression order (one conditional sum per term, added left to
  * right), not by a floating-point aggregation whose order varies with
  * partitioning — a DuckDB oracle replays the identical double ops.
  */
object Retrieval {

  /** Benchmark-contamination screening (n-gram overlap): for each corpus
    * doc, the fraction of its distinct w-word shingles that appear anywhere
    * in the benchmark set — the decontamination signal computed before a
    * training-data release. Docs shorter than w words emit no row.
    */
  def contamination(corpus: DataFrame, bench: DataFrame,
      textCol: String = "text", w: Int = 5): DataFrame = {
    val benchGrams = bench
      .select(explode(Dedup.shinglesNative(bench(textCol), w)).as("sh"))
      .distinct()
      .withColumn("__hit", lit(1L))
    // spread: shingle construction is compute-dense vs input bytes
    // (GraftSession.spread — no-op at scale)
    val docGrams = graft.GraftSession.spread(
      corpus.select(col("doc_id"), corpus(textCol).as("__text")))
      .select(col("doc_id"), explode(Dedup.shinglesNative(col("__text"), w)).as("sh"))
    docGrams
      .join(broadcast(benchGrams), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_contaminated"))
      .withColumn("contamination", col("n_contaminated") / col("n_grams"))
  }

  /** Okapi BM25 score of every corpus doc against a bag of query terms:
    *   score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
    *
    * Output: (doc_id, bm25) for docs containing ≥1 query term, bm25 rounded
    * to 6 decimals (ln is the one libm-dependent op in the chain).
    */
  def bm25(corpus: DataFrame, terms: Seq[String], textCol: String = "text",
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // deliberately NO spread here (unlike the shingle/k-gram ops):
    // whitespace tokenization is a trivial split, so the work is
    // shuffle-dominated — measured 0.89 s bare vs 1.23 s with the extra
    // pre-explode exchange at sf0.1; the groupBys below redistribute anyway
    val toks = corpus
      .select(col("doc_id"), explode(TextOps.tokens(corpus(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
    // per-doc length and the two corpus constants (one tiny row, broadcast)
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(col("dl")).cast("double").as("total_len"))
    // term frequencies for query terms only — the explode stream shrinks to
    // |terms| rows per doc before any join
    val tf = toks.filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("tok"))
      .agg(count(lit(1)).cast("double").as("dfreq"))
    val contrib = tf
      .join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(stats))
      .join(dl, "doc_id")
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("dfreq") + lit(0.5)) /
          (col("dfreq") + lit(0.5))))
      .withColumn("c",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / (col("total_len") / col("n_docs")))))
    // fixed-order total: one exact single-row sum per term, then added in
    // the terms' declaration order — no aggregation-order nondeterminism
    val perTerm = contrib.groupBy(col("doc_id"))
      .agg(
        coalesce(sum(when(col("tok") === terms.head, col("c"))), lit(0.0))
          .as(s"__c0"),
        terms.tail.zipWithIndex.map { case (t, i) =>
          coalesce(sum(when(col("tok") === t, col("c"))), lit(0.0))
            .as(s"__c${i + 1}")
        }: _*)
    val total = terms.indices.map(i => col(s"__c$i")).reduce(_ + _)
    perTerm.select(col("doc_id"), round(total, 6).as("bm25"))
  }
}
