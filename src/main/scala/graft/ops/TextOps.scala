package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, fingerprinting. All pure Column
  * algebra (codegen'd, no UDFs) — they scale as plain projections.
  */
object TextOps {

  /** whitespace tokens, lowercased */
  def tokens(text: Column): Column = split(lower(text), " +")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count estimate: words + punctuation runs + digit runs */
  def subwordCountEstimate(text: Column): Column =
    (size(split(text, " +")) +
      size(split(text, "[^\\p{Punct}]+")) - 1 +
      size(split(text, "[^0-9]+")) - 1).cast("long")

  def meanTokenLen(text: Column): Column = {
    val n = size(tokens(text))
    when(n > 0,
      (length(regexp_replace(text, " ", "")).cast("double")) / n.cast("double"))
      .otherwise(lit(0.0))
  }

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "la", "los", "y", "es", "un"))

  def stopwordCount(text: Column, lang: String = "en"): Column =
    stopwordCountIn(text, stopwords(lang))

  def stopwordCountIn(text: Column, words: Seq[String]): Column = {
    val arr = array(words.map(lit): _*)
    size(filter(tokens(text), w => array_contains(arr, w))).cast("long")
  }

  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    val n = size(tokens(text))
    when(n > 0, stopwordCount(text, lang).cast("double") / n.cast("double"))
      .otherwise(lit(0.0))
  }

  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n > 0,
      (n - length(regexp_replace(text, "\\p{Punct}", ""))).cast("double") / n.cast("double"))
      .otherwise(lit(0.0))
  }

  /** heuristic quality score in [0,1]: length band + stopword presence +
    * moderate punctuation + reasonable mean token length
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    val punctScore = greatest(lit(1.0) - punctRatio(text) * lit(5.0), lit(0.0))
    val mtl = meanTokenLen(text)
    val mtlScore = when(mtl.between(3.0, 10.0), 1.0).otherwise(0.5)
    round((lenScore + stopScore + punctScore + mtlScore) / lit(4.0), 6)
  }

  /** n-gram-heuristic language ID: argmax of per-language stopword hit
    * counts; ties (incl. all-zero) → "und" (undetermined).
    */
  def langId(text: Column): Column = {
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, ws) =>
      struct(stopwordCountIn(text, ws).as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** stable document fingerprint over normalized text (md5 — deterministic
    * across engines; the reference's xxhash-trigram fingerprint is an
    * internal id, /root/reference/internal/fingerprint/fingerprint.go:119-172)
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), " +", " "))

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * hash every k-gram of the normalized text, slide a window of w
    * consecutive k-gram hashes, keep each window's minimum. Any substring
    * match of length ≥ w+k−1 between two documents is guaranteed to share
    * at least one selected fingerprint — the local-algorithm property that
    * plain "0 mod p" sampling lacks. The rolling hash is md5-derived
    * (48-bit prefix), deterministic across engines.
    *
    * Scale shape: one explode to |text| k-gram rows (same class as the
    * MinHash shingle explode), one shuffle to co-locate a document's
    * grams, a w-row sliding min, then a distinct per (doc, fp). No UDFs —
    * the whole pipeline is codegen'd Column algebra.
    *
    * Returns (doc_id, fp) — the distinct selected fingerprints per doc.
    */
  def winnow(df: DataFrame, k: Int = 8, w: Int = 4,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val norm = regexp_replace(lower(trim(df(textCol))), "\\s+", " ")
    val grams = df
      .select(df(idCol).as("doc_id"), norm.as("t"))
      .filter(length(col("t")) >= k)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(1), length(col("t")) - (k - 1))).as("p"))
      .select(col("doc_id"), col("p"),
        conv(substring(md5(substr(col("t"), col("p"), lit(k))), 1, 12), 16, 10)
          .cast("long").as("h"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      .rowsBetween(-(w - 1), 0)
    grams
      .withColumn("fp", min(col("h")).over(win))
      .filter(col("p") >= w) // full windows only
      .select(col("doc_id"), col("fp"))
      .distinct()
  }

  /** Near-dup candidate pairs from shared winnowed fingerprints: pairs of
    * docs sharing ≥ minShared selected fingerprints. Winnowing's guarantee
    * makes this SUBSTRING-overlap detection — shared passages, quotes,
    * boilerplate, plagiarism — a different signal from MinHash's
    * bag-of-shingles similarity. Same scale shape as the other pair
    * generators: per-fingerprint doc lists (no self-join — singleton
    * fingerprints never reach the pair stage), hot fingerprints capped
    * before the quadratic expansion.
    */
  def winnowPairs(df: DataFrame, k: Int = 8, w: Int = 4, minShared: Int = 2,
      maxDocsPerFp: Int = 1000, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val fps = winnow(df, k, w, textCol, idCol)
    val ds = col("ds")
    val combos = flatten(transform(ds, (x, i) =>
      transform(slice(ds, i + lit(2), size(ds)),
        y => struct(x.as("a"), y.as("b")))))
    fps.groupBy(col("fp"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2 && size(col("ds")) <= maxDocsPerFp)
      .select(explode(combos).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** all-in-one profile projection over a documents frame */
  def profile(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = df(textCol)
    df.select(
      df("doc_id"),
      tokenCount(t).as("n_tokens"),
      length(t).cast("long").as("n_chars"),
      round(meanTokenLen(t), 6).as("mean_token_len"),
      round(stopwordRatio(t), 6).as("stopword_ratio"),
      round(punctRatio(t), 6).as("punct_ratio"),
      qualityScore(t).as("quality"),
      langId(t).as("lang_pred"),
      fingerprint(t).as("fp"))
  }
}
