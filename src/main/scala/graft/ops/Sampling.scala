package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation: the keep/drop
  * decision is a pure function of the row id (md5-uniform), so the same
  * sample reproduces across runs, engines, and re-partitions — the
  * property that makes a curated dataset auditable. No RNG state, no
  * `rand()` (non-deterministic under retries), one codegen'd projection.
  */
object Sampling {

  /** uniform in [0,1) from an id column: 48-bit md5 prefix / 2^48 (the
    * division is by a power of two → exact in a double, so `< rate`
    * comparisons replay bit-identically in any engine)
    */
  def uniform(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 12), 16, 10).cast("double") /
      lit((1L << 48).toDouble)

  /** per-stratum keep flag: true iff uniform(id) < rate(stratum); strata
    * absent from `rates` use defaultRate
    */
  def keepFlag(stratum: Column, id: Column, rates: Map[String, Double],
      defaultRate: Double): Column = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate)) {
      case (acc, (k, r)) => when(stratum === k, lit(r)).otherwise(acc)
    }
    uniform(id) < rate
  }

  /** Stratified Bernoulli sample: keep each row with its stratum's rate —
    * downsample the dominant class, keep the rare ones, deterministically.
    */
  def stratified(df: DataFrame, stratumCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame =
    df.filter(keepFlag(graft.GraftSession.safeCol(df, stratumCol),
      graft.GraftSession.safeCol(df, idCol), rates, defaultRate))

  /** α-weighted mixture sampling — the standard training-data source
    * reweighting (GPT-3/Pile-style): source s with c_s documents gets
    * mixture weight w_s = c_s^α / Σ_t c_t^α, flattening the natural
    * distribution toward uniform as α → 0. Each document of source s
    * keeps with probability min(1, targetN · w_s / c_s) — i.e. the sample
    * aims at targetN docs distributed by the α-weights, never upsamples,
    * and stays a deterministic per-row md5 draw.
    *
    * Scale shape: one tiny per-source count aggregate (source cardinality
    * rows) broadcast back onto the corpus as a plan-time rate map — the
    * corpus itself is touched by exactly one filter projection, no
    * shuffle. The per-source keep rates ride the output (`keep_rate`) so
    * an external engine can replay the exact draw.
    */
  def alphaMixture(df: DataFrame, srcCol: String, idCol: String,
      alpha: Double, targetN: Long): DataFrame = {
    val src = graft.GraftSession.safeCol(df, srcCol)
    // per-source counts: a plan-time statistic (same spirit as AQE stats
    // and Similarity.planesFor) — source cardinality rows, not corpus rows
    val counts = df.groupBy(src.as("__s")).agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Σ over sources in sorted-name order (deterministic fold), and the
    // final rate floor-quantized to a 2^-30 dyadic grid: pow() is not
    // correctly-rounded across engines, so an external replay matches the
    // grid value exactly instead of chasing ulps through the division
    val totalW = counts.toSeq.sortBy(_._1)
      .map { case (_, c) => math.pow(c.toDouble, alpha) }.sum
    val grid = (1L << 30).toDouble
    val rates = counts.map { case (s, c) =>
      val r = math.min(1.0, targetN * (math.pow(c.toDouble, alpha) / totalW) / c)
      s -> math.floor(r * grid) / grid
    }
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (k, r)) => when(src === k, lit(r)).otherwise(acc)
    }
    df.withColumn("keep_rate", rate)
      .filter(uniform(graft.GraftSession.safeCol(df, idCol)) < col("keep_rate"))
  }

  /** Token-budgeted mixture selection — the variant real training runs
    * use (budgets are in TOKENS, not documents): source s with token
    * mass T_s gets budget floor(targetTokens · T_s^α / Σ_t T_t^α + δ)
    * (δ = the repo's irrational grid offset, so a pow() ulp difference
    * between engines can never flip the floor), and docs are admitted
    * in deterministic md5 order until their source's running token sum
    * crosses the budget — the crossing doc is kept, so a non-empty
    * budget always admits at least one doc.
    *
    * Scale shape: one tiny per-source sum (source-cardinality rows,
    * a plan-time statistic), then ONE window partitioned by source for
    * the running sum — no global window, no shuffle beyond the source
    * partitioning. Adds `n_tokens` and `token_budget`; rows past their
    * budget are dropped.
    */
  def tokenBudgetMixture(df: DataFrame, srcCol: String, idCol: String,
      tokensCol: String, alpha: Double, targetTokens: Long,
      seed: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val src = graft.GraftSession.safeCol(df, srcCol)
    val id = graft.GraftSession.safeCol(df, idCol)
    val toks = graft.GraftSession.safeCol(df, tokensCol).cast("long")
    val sums = df.groupBy(src.as("__s")).agg(sum(toks).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalW = sums.toSeq.sortBy(_._1)
      .map { case (_, t) => math.pow(t.toDouble, alpha) }.sum
    val budgets = sums.map { case (s0, t) =>
      s0 -> math.floor(targetTokens *
        (math.pow(t.toDouble, alpha) / totalW) + 0.31830988618367446).toLong
    }
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (k, b)) => when(src === k, lit(b)).otherwise(acc)
    }
    val key = md5(concat_ws("|", lit(seed.toString), id.cast("string")))
    val w = Window.partitionBy(src).orderBy(key, id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("token_budget", budget)
      .withColumn("n_tokens", toks)
      .withColumn("__run", sum(col("n_tokens")).over(w))
      .filter(col("__run") - col("n_tokens") < col("token_budget"))
      .drop("__run")
  }

  /** Deterministic global shuffle — the training-order randomization pass:
    * every row gets a contiguous position 0..n−1 in md5(seed|id) order,
    * reproducible across runs, engines, and partitionings.
    *
    * Scale shape: a naive `row_number() OVER (ORDER BY …)` is an
    * unpartitioned window — one task ranks the planet. Instead: (1)
    * range-repartition + sort by the shuffle key (Spark's distributed
    * sort, same machinery as orderBy); (2) count rows per partition — a
    * driver-side statistic bounded by PARTITION COUNT, not rows (the
    * zipWithIndex construction); (3) add each partition's prefix-sum
    * offset to a per-partition rank, which IS partitionable. Rank
    * correctness needs only the range property (partition i's keys all
    * precede partition i+1's), not boundary placement, so RangePartitioner
    * sampling can't perturb the result; the id tiebreak makes the order
    * total even under an md5 collision.
    */
  def globalShuffle(df: DataFrame, idCol: String, seed: Int): DataFrame = {
    val id = graft.GraftSession.safeCol(df, idCol)
    val key = md5(concat_ws("|", lit(seed.toString), id.cast("string")))
    rankedPos(df.withColumn("__k", key), Seq(col("__k"), id)).drop("__k")
  }

  /** Deterministic curriculum order — easy-first training order with
    * within-band randomization: rows rank by (difficulty band asc,
    * md5(seed|id), id). The band is any caller-derived deterministic
    * integer (a quality-score bucket, a length bucket); the md5 key
    * shuffles inside each band so the model never sees a
    * quality-correlated sub-order. Same single-range-sort machinery as
    * [[globalShuffle]] — no global window anywhere.
    */
  def curriculumOrder(df: DataFrame, idCol: String, bandCol: String,
      seed: Int): DataFrame = {
    val id = graft.GraftSession.safeCol(df, idCol)
    val key = md5(concat_ws("|", lit(seed.toString), id.cast("string")))
    rankedPos(df.withColumn("__k", key),
      Seq(graft.GraftSession.safeCol(df, bandCol), col("__k"), id))
      .drop("__k")
  }

  /** contiguous position 0..n−1 in `sortCols` order with ONE range sort:
    * (1) range-repartition + sort (Spark's distributed sort machinery);
    * (2) per-partition counts — a driver-side statistic bounded by
    * PARTITION COUNT; (3) prefix-sum offsets broadcast back. A window
    * `PARTITION BY __pid` would re-shuffle the corpus a second time just
    * to rank rows already sorted in place — monotonically_increasing_id
    * after the in-partition sort is the shuffle-free local rank (its
    * documented layout is partition_id << 33 | consecutive row index,
    * normalized against the per-partition min so only "consecutive
    * within a partition, assigned in plan order" is relied on).
    */
  private def rankedPos(df: DataFrame, sortCols: Seq[Column]): DataFrame = {
    val sorted = graft.GraftSession.spread(df)
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val cached = graft.GraftSession.materialize(sorted)
      .withColumn("__mid", monotonically_increasing_id())
    // per-partition (count, min local id) → prefix-sum offsets: a
    // driver-side statistic bounded by PARTITION COUNT, not rows
    val counts = cached.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__c"), min(col("__mid")).as("__m"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (p, c, m) =>
      val o = acc; acc += c; (p, o, m)
    }
    // offsets ride back as a BROADCAST join on __pid (a chained-when would
    // be a partition-count-deep case expression — fine at 32, not at 10k)
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off", "__min"))
    cached
      .join(offDf, Seq("__pid"))
      .withColumn("pos", col("__mid") - col("__min") + col("__off"))
      .drop("__pid", "__mid", "__off", "__min")
  }

  /** Adjacent word bigrams ("w1 w2") of the lowercased, whitespace-split,
    * empty-filtered token stream — with the token array bound exactly ONCE
    * via the array(x)[1] wrapper: interpreted higher-order functions get
    * no common-subexpression elimination, so naming `ws` inside the
    * per-element lambda (the element_at(ws, i) form) re-ran the whole
    * tokenize+filter once per ELEMENT access — O(len²) per doc, ~40 µs per
    * bigram observed. The zip_with over two slices of the bound array is
    * O(len).
    */
  private def wordBigrams(text: Column): Column =
    element_at(transform(array(filter(TextOps.tokens(text),
        w => length(w) > 0)), w =>
      when(size(w) >= 2,
        zip_with(slice(w, lit(1), size(w) - 1), slice(w, lit(2), size(w) - 1),
          (a, b) => concat(a, lit(" "), b)))
        .otherwise(array().cast("array<string>"))), 1)

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling" — public): documents are
    * scored by how much their hashed-n-gram feature distribution looks
    * like a TARGET corpus versus the RAW pool. Word bigrams hash into
    * `buckets` buckets (md5-derived — oracle-replayable); per bucket the
    * Laplace-smoothed log-ratio `ln((tgt_b+1)/(tgtN+B)) −
    * ln((raw_b+1)/(rawN+B))` is the importance weight; a doc's score is
    * the POSITION-ORDERED sum of its bigrams' weights divided by the
    * bigram count (the same ordered-fold float discipline as
    * [[TextOps.surprisal]] — map-side float reduction order would
    * otherwise be nondeterministic). Selection = keep the top-scoring
    * docs (or gumbel-resample on score — composition left to the
    * caller). One shuffle for bucket stats (B-bounded), one
    * bigram→bucket join, one per-doc aggregate.
    */
  def dsirScore(df: DataFrame, textCol: String, isTarget: Column,
      buckets: Int = 4096): DataFrame = {
    // learn the bounded weight table (≤B doubles, a plan-time statistic
    // like the PQ codebook), then score every doc in ONE native per-row
    // projection — no bigram explode, no bucket join, no per-doc
    // interpreted fold. Bit-equal to [[dsirScoreColumns]] (the
    // distributed-join canonical form the oracle replays, and the
    // OpsSpec equivalence gate): identical weight doubles (same IEEE
    // log/sub on the same exact integer counts) and the identical
    // position-ordered accumulation inside [[DsirRowScore]].
    val w = dsirWeights(df, textCol, isTarget, buckets)
    dsirScoreAgainst(
      graft.GraftSession.spread(df.select(df("doc_id"), df(textCol))),
      textCol, w, buckets)
  }

  /** the CANONICAL distributed-join form of [[dsirScore]] — the
    * executable reference for the equivalence gates and the shape the
    * DuckDB oracle replays (bucket stats → weight join → position-ordered
    * fold); the production path learns the bounded weight table once and
    * scores with the fused native row expression instead
    */
  def dsirScoreColumns(df: DataFrame, textCol: String, isTarget: Column,
      buckets: Int = 4096): DataFrame = {
    // spread: interpreted per-bigram construction is compute-dense vs
    // input bytes (single-file corpora otherwise run it in ONE task);
    // materialize: the bigram explode + md5 bucketing is the expensive
    // pass and BOTH consumers (bucket stats, per-doc join-back) read it
    val src = graft.GraftSession.spread(
      df.select(df("doc_id"), isTarget.cast("int").as("__t"),
        df(textCol).as("__text")))
    val bigrams = wordBigrams(col("__text"))
    val toks = graft.GraftSession.materialize(src
      .select(col("doc_id"), col("__t"),
        posexplode(bigrams).as(Seq("pos", "bg")))
      .withColumn("__b", Dedup.hash48(col("bg"), 0) % buckets)
      .drop("bg"))
    val stats = toks.groupBy(col("__b"))
      .agg(sum(col("__t")).as("tb"),
        sum(lit(1) - col("__t")).as("rb"))
    val totals = stats.agg(sum(col("tb")).as("__tn"), sum(col("rb")).as("__rn"))
    val weighted = stats.crossJoin(broadcast(totals))
      .withColumn("wt",
        log((col("tb") + 1).cast("double") /
            (col("__tn") + buckets).cast("double")) -
        log((col("rb") + 1).cast("double") /
            (col("__rn") + buckets).cast("double")))
      .select(col("__b"), col("wt"))
    toks.join(weighted, Seq("__b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        aggregate(
          transform(array_sort(collect_list(struct(col("pos"), col("wt")))),
            s => s.getField("wt")),
          lit(0.0), (acc, v) => acc + v).as("__sum"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("__sum") / col("n_bigrams").cast("double")).as("dsir_score"))
  }

  /** The learned DSIR bucket-weight table as a plan-time constant:
    * index b holds the Laplace-smoothed log-ratio for bucket b (the same
    * values [[dsirScore]] derives distributed). Collecting B doubles is
    * a bounded plan-time statistic — the same pattern as the PQ codebook
    * — enabling the ZERO-STATE streaming scorer below.
    */
  def dsirWeights(df: DataFrame, textCol: String, isTarget: Column,
      buckets: Int = 4096): Array[Double] = {
    // spread: the bigram construction is compute-dense vs input bytes
    // (single-file corpora otherwise run it in ONE task); materialize the
    // ≤B-row stats — totals and the collect below both read them
    val src = graft.GraftSession.spread(
      df.select(isTarget.cast("int").as("__t"), df(textCol).as("__text")))
    // fused native bigram->bucket pass ([[BigramBuckets]], bit-equal to
    // explode(wordBigrams) + hash48 % buckets — DsirRowScore's own hash)
    val toks = src.select(col("__t"),
      explode(BigramBuckets.buckets(col("__text"), buckets)).as("__bi"))
      .select(col("__t"), col("__bi").cast("long").as("__b"))
    val stats = graft.GraftSession.materialize(toks.groupBy(col("__b"))
      .agg(sum(col("__t")).as("tb"), sum(lit(1) - col("__t")).as("rb")))
    val (tn, rn) = {
      val r = stats.agg(sum(col("tb")), sum(col("rb"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val out = new Array[Double](buckets)
    // empty buckets get the smoothing-only ratio, same as the formula
    val base = math.log(1.0 / (tn + buckets).toDouble) -
      math.log(1.0 / (rn + buckets).toDouble)
    java.util.Arrays.fill(out, base)
    stats.collect().foreach { r =>
      out(r.getLong(0).toInt) =
        math.log((r.getLong(1) + 1).toDouble / (tn + buckets).toDouble) -
          math.log((r.getLong(2) + 1).toDouble / (rn + buckets).toDouble)
    }
    out
  }

  /** ZERO-STATE streaming DSIR scorer — the importance-scoring twin of
    * [[graft.streaming.StreamingDedup.nearDupAgainst]]: each incoming doc
    * scores in ONE per-row projection (bigram → bucket → literal weight
    * lookup, summed in position order — the identical fold order and
    * weight values as the batch [[dsirScore]], so the two agree
    * bit-for-bit), with the weight table inlined as a plan-time literal.
    * No join, no shuffle, no streaming state: works unchanged on a
    * streaming frame; refresh weights by restarting against a new
    * snapshot.
    */
  def dsirScoreAgainst(stream: DataFrame, textCol: String,
      weights: Array[Double], buckets: Int = 4096): DataFrame = {
    require(weights.length == buckets, s"${weights.length} weights != $buckets")
    stream
      .withColumn("__s", DsirRowScore.score(col(textCol), weights, buckets))
      .filter(col("__s").isNotNull)
      .select(col("doc_id"), col("__s.n_bigrams").as("n_bigrams"),
        col("__s.dsir_score").as("dsir_score"))
  }

  /** Importance RESAMPLING via the Gumbel-max trick (the selection step
    * DSIR pairs with its scores): drawing n docs without replacement with
    * probability ∝ exp(score/τ) is exactly "take the top n by
    * score/τ + Gumbel noise", and the noise is DETERMINISTIC here —
    * g = −ln(−ln(u)) with u the md5-uniform of the doc id ([[uniform]]),
    * so any engine (and any rerun) selects the identical sample. The cut
    * is orderBy+limit → TakeOrderedAndProject: per-partition partial
    * top-n, no global sort.
    */
  def importanceResample(scored: DataFrame, scoreCol: String, idCol: String,
      n: Int, temperature: Double = 1.0): DataFrame = {
    val g = -log(-log(uniform(col(idCol))))
    scored
      .withColumn("gumbel_key", col(scoreCol) / temperature + g)
      .orderBy(col("gumbel_key").desc, col(idCol).asc)
      .limit(n)
  }
}
