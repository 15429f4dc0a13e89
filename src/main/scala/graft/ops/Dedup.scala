package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: everything here is expressed as explode → shuffle-on-key →
  * aggregate, the shape that survives 100 TB (no driver-side state, no
  * cross joins except an optional exact-verify step on candidate pairs,
  * which is bounded by candidate count, not corpus size).
  *
  * Cross-engine determinism: hashes derive from md5 (identical in any
  * engine), so DuckDB oracles can replay every step bit-for-bit.
  */
object Dedup {

  /** all ordered (a, b) pair structs (a before b) from a SORTED list
    * column — the shared per-bucket pair-expansion of every capped
    * doc-list pair stage (n-gram Jaccard, winnowing, containment)
    */
  private[graft] def orderedPairs(ds: Column): Column =
    flatten(transform(ds, (x, i) =>
      transform(slice(ds, i + lit(2), size(ds)),
        y => struct(x.as("a"), y.as("b")))))

  /** The same ordered-pair expansion SPREAD ACROSS TASKS (r18 VERDICT
    * next-round #5, guide §2.5 skew): `explode(orderedPairs(ds))` builds
    * a bucket's whole O(cap²) pair array inside the ONE reduce task that
    * owns the bucket's groupBy output row — at cap 1000 that is a ~500k
    * pair straggler task (measured 1-2.4 s while 31 cores idle). Here
    * each bucket first posexplodes into (head doc `a`, tail slice) rows
    * — O(|ds|) rows carrying the pairs as array payload — which
    * re-partition BY `a` (high-cardinality doc id, so a hot bucket's
    * heads land on different tasks) before the per-head tail explode.
    * The downstream `groupBy(a, b)` is keyed by a superset of the
    * repartition key, so it plans exchange-free: same exchange COUNT as
    * the old shape (bucket-key exchange + one more), same pair multiset
    * (PropertySpec pins it), no single-bucket task ceiling. Residual
    * bound, documented: one doc id that heads MANY buckets concentrates
    * its pair stream on one task — bounded by that doc's bucket count ×
    * cap, which is the pair count the result itself must hold for that
    * doc, not cap² per bucket.
    *
    * `lists` must carry a sorted array column `dsCol`; returns (a, b)
    * rows, hash-partitioned by `a`.
    */
  private[graft] def spreadOrderedPairs(lists: DataFrame,
      dsCol: String = "ds"): DataFrame = {
    val ds = col(dsCol)
    lists
      .select(ds.as("__ds"), posexplode(ds).as(Seq("__i", "a")))
      .filter(col("__i") < size(col("__ds")) - 1)
      .select(col("a"),
        slice(col("__ds"), col("__i") + lit(2), size(col("__ds"))).as("__tail"))
      .repartition(col("a"))
      .select(col("a"), explode(col("__tail")).as("b"))
  }

  /** stable 48-bit integer hash of a string (md5-derived → engine-neutral) */
  def hash48(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(seed.toString), lit("|"), c)), 1, 12), 16, 10)
      .cast("long")

  /** w-word shingles (space-joined), distinct per doc; docs shorter than w
    * words yield no shingles. This is the CANONICAL Column-algebra form —
    * the executable reference the fused native [[ShingleSet]] is
    * property-pinned against (and the shape the DuckDB oracles replay);
    * hot paths call [[shinglesNative]] instead.
    */
  def shingles(text: Column, w: Int = 5): Column = {
    val words = split(text, " +")
    val n = size(words)
    array_distinct(
      when(n >= w,
        transform(sequence(lit(1), n - lit(w - 1)),
          i => array_join(slice(words, i, lit(w)), " ")))
        .otherwise(array().cast("array<string>")))
  }

  /** fused one-pass twin of [[shingles]] ([[ShingleSet]], codegen'd;
    * PropertySpec pins element-for-element equality)
    */
  def shinglesNative(text: Column, w: Int = 5): Column =
    ShingleSet.shingles(text, w)

  /** Boilerplate shingle mining — the empirical basis for every
    * hot-bucket cap in this file: the w-word shingles shared by the
    * most DOCUMENTS (cookie banners, footers, license blurbs). One
    * distinct-per-doc explode, one groupBy (map-side combined), then
    * TakeOrdered for the top-k — no global sort materializes. Ties at
    * the cut break by shingle text, so the mined list is deterministic
    * and replayable.
    */
  def stopShingles(df: DataFrame, textCol: String, w: Int = 5,
      topK: Int = 20): DataFrame =
    df.select(explode(shinglesNative(df(textCol), w)).as("sh"))
      .groupBy(col("sh")).agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("sh").asc)
      .limit(topK)

  /** Exact dedup: keep the first row (min orderCol) per identical text. */
  def exact(df: DataFrame, textCol: String, orderCol: String): DataFrame = {
    val fp = md5(df(textCol))
    df.withColumn("__fp", fp)
      .groupBy(col("__fp"))
      .agg(min(col(orderCol)).as(orderCol), count(lit(1)).as("n_copies"))
      .drop("__fp")
  }

  /** MinHash signatures: one row per doc, `sig` = array of k min-hashes over
    * shingles. Docs without shingles are dropped.
    *
    * Hash family: ONE md5 base hash per shingle, k affine derivations
    * `((2j+1)·h + j·K) mod 2^48` — 16× fewer md5 calls than hashing per
    * seed, still engine-neutral (plain integer ops in the oracle).
    *
    * Execution: the fused native [[MinHashSig]] row expression — one JVM
    * pass per document, NO shuffle at all (the r11 form exploded every
    * shingle, hashed it through interpreted Column algebra, and shuffled
    * |shingles| rows into k min-aggregates; the signature is a per-row
    * statistic, so none of that movement was necessary). PropertySpec
    * pins the fused form equal to the explode→groupBy formulation, whose
    * shape the DuckDB oracles still replay.
    */
  def minhash(df: DataFrame, textCol: String, k: Int = 16, w: Int = 5): DataFrame =
    // spread: the shingle construction + per-shingle md5 is compute-dense
    // relative to input bytes — see GraftSession.spread (no-op at scale)
    graft.GraftSession.spread(
        df.select(col("doc_id"), df(textCol).as("__text")))
      .select(col("doc_id"), MinHashSig.sig(col("__text"), k, w).as("sig"))
      .filter(col("sig").isNotNull)

  /** Cap a banded frame's per-(band, bucket) membership at
    * `maxDocsPerBucket`: buckets above the cap are dropped entirely —
    * the band-join analog of ngramJaccard's stop-shingle filter. A
    * bucket shared by B docs emits B² candidate pairs from ONE reduce
    * key; boilerplate-heavy corpora (exactly what dedup targets) create
    * such buckets, and an uncapped join goes quadratic on them. Over-cap
    * buckets carry no dedup signal — their members collide on
    * boilerplate, not content. The size prefilter is one co-partitioned
    * count + join (same key as the band join that follows), and
    * `minMembers` = 2 also drops singleton buckets — the vast majority —
    * before the join sees them.
    */
  private[graft] def capBuckets(banded: DataFrame, maxDocsPerBucket: Int,
      minMembers: Int = 1): DataFrame = {
    val sizes = banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("__bsz"))
    banded.join(sizes, Seq("band", "bucket"))
      .filter(col("__bsz").between(minMembers, maxDocsPerBucket))
      .drop("__bsz")
  }

  /** LSH candidate pairs: band the signature (bands × rowsPerBand = k),
    * bucket-join on (band, md5(band-slice)), estimate similarity as the
    * fraction of equal signature positions. Returns doc pairs (a < b) with
    * est_sim ≥ threshold. Buckets with more than `maxDocsPerBucket`
    * members are dropped before the join ([[capBuckets]]).
    */
  def minhashLsh(df: DataFrame, textCol: String, k: Int = 16, bands: Int = 4,
      w: Int = 5, threshold: Double = 0.5,
      maxDocsPerBucket: Int = 1000): DataFrame = {
    val rows = k / bands
    // materialize signatures once (one small row per doc): the shingle
    // explode + k min-aggs behind them is the expensive pass, and the
    // banded self-join below would recompute it for each side
    val sigs = graft.GraftSession.materialize(minhash(df, textCol, k, w))
    val banded = capBuckets(sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          md5(array_join(slice(col("sig"), b * rows + 1, rows), ",")).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bucket")),
      maxDocsPerBucket, minMembers = 2)
    val l = banded.select(col("band"), col("bucket"),
      col("doc_id").as("a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"),
      col("doc_id").as("b"), col("sig").as("sig_b"))
    val pairs = l.join(r, Seq("band", "bucket")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("sig_a"), col("sig_b")).distinct()
    val eq = size(filter(zip_with(col("sig_a"), col("sig_b"),
      (x, y) => when(x === y, 1).otherwise(0)), v => v === 1))
    pairs
      .withColumn("est_sim", eq.cast("double") / lit(k.toDouble))
      .filter(col("est_sim") >= threshold)
      .select(col("a"), col("b"), col("est_sim"))
      .distinct()
  }

  /** Incremental (cross-corpus) dedup: match INCOMING docs against an
    * EXISTING corpus by MinHash-LSH — the daily-crawl-vs-training-set
    * operation. Each side gets its own signature pass (same total work as
    * one pass over the union — no recompute), and the band join is
    * strictly existing×incoming: no incoming×incoming or existing×existing
    * pairs are generated, so refresh cost scales with the small incoming
    * batch, not the accumulated corpus. At 100 TB the existing side's
    * signatures are one small row per doc and would be PERSISTED between
    * refreshes; here they are recomputed because the catalog query is
    * self-contained.
    *
    * Returns one row per matched incoming doc: `new_id`,
    * `n_dup_candidates` (threshold-passing existing matches), `best_sim`,
    * and `min_match` (lowest matching existing doc_id — a deterministic
    * representative). Survivors = incoming anti-joined on `new_id`.
    */
  def incrementalDedup(existing: DataFrame, incoming: DataFrame,
      textCol: String, k: Int = 16, bands: Int = 4, w: Int = 5,
      threshold: Double = 0.5, maxDocsPerBucket: Int = 1000): DataFrame =
    incrementalDedupFromSigs(
      graft.GraftSession.materialize(minhash(existing, textCol, k, w)),
      graft.GraftSession.materialize(minhash(incoming, textCol, k, w)),
      k, bands, threshold, maxDocsPerBucket)

  /** [[incrementalDedup]]'s core over PRE-COMPUTED signature frames
    * (doc_id, sig) — the entry point the persisted-store refresh path
    * ([[SignatureStore.incrementalDedup]]) uses so the existing corpus's
    * signatures come off disk instead of a full recompute. Each SIDE's
    * buckets are capped independently: per-bucket join expansion is
    * |L|·|R| ≤ cap², the same bound the single-corpus cap gives, without
    * a cross-frame count.
    */
  def incrementalDedupFromSigs(existingSigs: DataFrame, incomingSigs: DataFrame,
      k: Int = 16, bands: Int = 4, threshold: Double = 0.5,
      maxDocsPerBucket: Int = 1000): DataFrame = {
    val rows = k / bands
    def banded(sigs: DataFrame, id: String, sig: String): DataFrame =
      capBuckets(sigs
        .select(col("doc_id"), col("sig"),
          explode(array((0 until bands).map { b =>
            struct(lit(b).as("band"),
              md5(array_join(slice(col("sig"), b * rows + 1, rows), ","))
                .as("bucket"))
          }: _*)).as("bb"))
        .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bucket")),
        maxDocsPerBucket)
        .select(col("doc_id").as(id), col("sig").as(sig),
          col("band"), col("bucket"))
    val l = banded(existingSigs, "old_id", "sig_a")
    val r = banded(incomingSigs, "new_id", "sig_b")
    val eq = size(filter(zip_with(col("sig_a"), col("sig_b"),
      (x, y) => when(x === y, 1).otherwise(0)), v => v === 1))
    l.join(r, Seq("band", "bucket"))
      .select(col("old_id"), col("new_id"), col("sig_a"), col("sig_b"))
      .distinct()
      .withColumn("est_sim", eq.cast("double") / lit(k.toDouble))
      .filter(col("est_sim") >= threshold)
      .groupBy(col("new_id"))
      .agg(count(lit(1)).as("n_dup_candidates"),
        max(col("est_sim")).as("best_sim"),
        min(col("old_id")).as("min_match"))
  }

  /** Exact n-gram Jaccard for pairs sharing ≥1 shingle (the verify step
    * after LSH, or standalone at moderate scale).
    *
    * Skew guard: shingles shared by more than `maxDocsPerShingle` docs are
    * dropped before pair expansion (standard stop-shingle filtering). One
    * hot shingle shared by 10^6 docs would otherwise emit ~10^12 pairs from
    * a single reduce key; such shingles are boilerplate with no dedup
    * signal. When the cap binds, `common` (and thus jaccard) is computed
    * over the surviving shingles only — document-level similarity from
    * discriminative n-grams.
    */
  def ngramJaccard(df: DataFrame, textCol: String, w: Int = 5,
      threshold: Double = 0.5, maxDocsPerShingle: Int = 1000): DataFrame = {
    // materialize the shingle stream once: the shingle construction (array
    // HOFs per doc) is the expensive pass and BOTH consumers below — sizes
    // and pair generation — read it. The checkpoint is the same data the
    // shuffle would spill anyway (memory-and-disk, lineage truncated).
    // spread first: the construction is compute-dense vs input bytes
    // (GraftSession.spread — no-op at scale)
    val sh = graft.GraftSession.materialize(
      graft.GraftSession.spread(df.select(col("doc_id"), df(textCol).as("__text")))
        .select(col("doc_id"), explode(shinglesNative(col("__text"), w)).as("sh")))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    // pair generation via per-shingle doc lists instead of a self-join:
    // singleton shingles (the vast majority) never reach the pair stage,
    // and the shuffle carries each shingle once instead of twice; the
    // O(cap²) per-bucket expansion is spread across tasks by head doc
    // ([[spreadOrderedPairs]] — no single-bucket straggler)
    val lists = sh.groupBy(col("sh"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2 && size(col("ds")) <= maxDocsPerShingle)
    val pairs = spreadOrderedPairs(lists)
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sa"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "sb"), "b")
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("sa") + col("sb") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Cross-corpus LINE deduplication (the CCNet / RefinedWeb cleaning
    * practice — public): a line occurring in more than `maxDocsPerLine`
    * DISTINCT documents is boilerplate (navigation, footers, cookie
    * banners, legal blurbs) and is dropped from EVERY document; each doc
    * reassembles from its surviving lines in original order. A different
    * granularity from all the doc-level dedups: the unit removed is the
    * repeated line, not the duplicate document.
    *
    * Returns one row per doc that keeps ≥1 line: input line count, kept
    * count, and an exact md5-derived integer checksum of the reassembled
    * text (a single wrong or misordered surviving line flips it). Scale
    * shape: one line-keyed count aggregate, one anti-join on the (small)
    * boilerplate line set, one per-doc aggregate — the same
    * explode→shuffle-on-key→aggregate shape as the other dedups, no
    * driver-side state.
    */
  def lineDedup(df: DataFrame, textCol: String,
      maxDocsPerLine: Int = 10): DataFrame = {
    val lines = graft.GraftSession.materialize(df.select(col("doc_id"),
      posexplode(split(df(textCol), "\n")).as(Seq("pos", "line"))))
    val boiler = lines.groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .filter(col("__nd") > maxDocsPerLine)
      .select(col("line"))
    val totals = lines.groupBy(col("doc_id")).agg(count(lit(1)).as("n_lines"))
    lines.join(boiler, Seq("line"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        pmod(hash48(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")), "\n"), 0), lit(1000003L))
          .as("text_checksum"))
      .join(totals, Seq("doc_id"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        col("text_checksum"))
  }

  /** Exact substring duplicate spans — ExactSubstr of Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better",
    * public), re-expressed as a distributed anchor-and-extend instead of
    * a monolithic suffix array: every k-word gram is an anchor keyed by
    * a content hash (xxhash64 — codegen'd, and an 8-byte join key where
    * md5 would shuffle 32-char strings; the hash is only an equality
    * proxy, so the oracle's md5 buckets are identical absent collisions,
    * and a 64-bit collision could at worst plant one isolated false
    * anchor that the ≥minWords run filter discards), docs sharing an
    * anchor share an exact k-word substring, and MAXIMAL shared runs are
    * recovered by merging
    * consecutive shared anchors on the same alignment diagonal
    * (pa − pb) — the gap-and-island trick, one fine-grained partitioned
    * window. Anchor buckets above `maxDocsPerGram` occurrences are
    * dropped before pair expansion (boilerplate grams — the same
    * stop-shingle bound as [[ngramJaccard]]), so there is no all-pairs
    * join anywhere and per-bucket expansion is capped.
    *
    * Returns cross-doc pairs (a < b) whose longest exactly-shared run is
    * ≥ `minWords` words, with that length and the number of shared
    * anchor positions.
    */
  def substrDup(df: DataFrame, textCol: String, k: Int = 8,
      minWords: Int = 12, maxDocsPerGram: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val src = graft.GraftSession.spread(
      df.select(col("doc_id"), df(textCol).as("__t")))
    // anchor construction is ONE fused native pass per doc
    // ([[WordGramAnchors]], codegen'd; DedupSpec pins it element-for-
    // element against the Column-algebra form, whose shape the DuckDB
    // oracle replays) — the interpreted transform × array_join(slice)
    // chain was this row's dominant task-CPU
    val occ = src
      .select(col("doc_id"), explode(WordGramAnchors.anchors(col("__t"), k)).as("o"))
      .select(col("doc_id"), col("o.pos").as("pos"), col("o.g").as("g"))
    // per-gram occurrence lists, capped; pairs expand inside the bucket
    val buckets = occ.groupBy(col("g"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("pos")))).as("ds"))
      .filter(size(col("ds")).between(2, maxDocsPerGram))
    val ds = col("ds")
    val combos = flatten(transform(ds, (x, i) =>
      transform(slice(ds, i + lit(2), size(ds)), y =>
        struct(x.getField("doc_id").as("a"), x.getField("pos").as("pa"),
          y.getField("doc_id").as("b"), y.getField("pos").as("pb")))))
    val pairs = buckets.select(explode(combos).as("p")).select(col("p.*"))
      .filter(col("a") < col("b"))
    // islands of consecutive pa on one diagonal = one maximal shared run
    val w = Window.partitionBy(col("a"), col("b"), col("pa") - col("pb"))
      .orderBy(col("pa"))
    val runs = pairs.withColumn("__rn", row_number().over(w))
      .groupBy(col("a"), col("b"), (col("pa") - col("pb")).as("__d"),
        (col("pa") - col("__rn")).as("__isl"))
      .agg(count(lit(1)).as("runlen"))
    runs.groupBy(col("a"), col("b"))
      .agg((max(col("runlen")) + lit(k - 1)).as("longest_words"),
        sum(col("runlen")).as("n_anchors"))
      .filter(col("longest_words") >= minWords)
  }

  /** Connected components over near-dup PAIRS — the transitive-closure
    * step a dedup pipeline runs after candidate generation, so "A≈B, B≈C"
    * collapses into one cluster with a canonical (min-id) representative.
    *
    * Min-label propagation WITH pointer jumping: each node starts labeled
    * with its own id; every round each node takes the min label among
    * itself and its neighbors, then follows that label one hop through the
    * label table (comp ← comp[comp]). The extra self-join makes the label
    * stride double-and-one per round, so chain-shaped components converge
    * in O(log diameter) rounds instead of O(diameter) — the same
    * shortcutting idea as large-star/small-star, with labels instead of
    * edge rewrites. Per round: one equi-join + one groupBy over the EDGE
    * set plus one label self-join — no driver-side graph, so the same loop
    * runs on 10¹⁰ edges; the driver reads only the converged flag, and
    * that flag rides the round's ONE materialization as an observed
    * metric (no separate count job per round).
    */
  def components(pairs: DataFrame, aCol: String = "a", bCol: String = "b",
      maxIter: Int = 20): DataFrame =
    componentsWithRounds(pairs, aCol, bCol, maxIter)._1

  /** [[components]] plus the number of rounds it took (round-count is a
    * tested convergence bound — see OpsSpec's 64-chain fixture)
    */
  def componentsWithRounds(pairs: DataFrame, aCol: String = "a",
      bCol: String = "b", maxIter: Int = 20): (DataFrame, Int) = {
    // the longest-lived materialization in the repo (read every round):
    // set spark.graft.checkpointDir on a real cluster so a lost executor
    // mid-convergence recovers from reliable storage (GraftSession.materialize).
    // Partitioned by the join key BEFORE the checkpoint (guide §2.4 —
    // LogicalRDD keeps the partitioning): every round's propagation join
    // reads edges BY y, and the distinct's (x, y) partitioning satisfied
    // none of them, so each round re-exchanged the edge set — the
    // loop's largest side, (rounds − 1) shuffles saved for one extra
    // up-front exchange.
    val edges = graft.GraftSession.materialize(
      pairs.select(col(aCol).as("x"), col(bCol).as("y"))
        .union(pairs.select(col(bCol).as("x"), col(aCol).as("y")))
        .distinct()
        .repartition(col("y")))
    var labels: DataFrame = edges.select(col("x").as("id")).distinct()
      .withColumn("comp", col("id"))
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val prop = edges.join(labels.withColumnRenamed("id", "y"), Seq("y"))
        .groupBy(col("x").as("id")).agg(min(col("comp")).as("ncomp"))
      val cand = labels.join(prop, Seq("id"), "left")
        .select(col("id"), col("comp"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("cand"))
      // pointer jump: labels are node ids, so the candidate label is
      // itself a row in the label table — follow it one hop (its label is
      // ≤ it by the invariant comp ≤ id, preserved inductively)
      val jump = labels.select(col("id").as("cand"), col("comp").as("jcomp"))
      val stepped = cand.join(jump, Seq("cand"), "left")
        .select(col("id"), col("comp"),
          least(col("cand"), coalesce(col("jcomp"), col("cand"))).as("comp2"))
      // the changed-count rides the materialization's own action as an
      // observed metric; the count() fallback only fires if the
      // checkpoint path ever stops reporting observations
      val obs = org.apache.spark.sql.Observation(s"graft_cc_$i")
      // label table checkpointed PARTITIONED BY id: the next round's three
      // label-keyed reads — the propagation join (key y = renamed id), the
      // pointer-jump self-join (key cand = renamed id), and the cand-side
      // id join — are all satisfied by hashpartitioning(id), so the round
      // plans ONE label exchange (this repartition) instead of one per
      // consumer (guide §2.4; same LogicalRDD-keeps-partitioning property
      // as the edges side above)
      val next = graft.GraftSession.materialize(
        stepped.observe(obs,
          coalesce(sum(when(col("comp2") < col("comp"), 1L).otherwise(0L)),
            lit(0L)).as("changed"))
          .repartition(col("id")))
      // metric delivery is async relative to the (eager) checkpoint job:
      // wait briefly for it, then fall back to a count over the cached
      // frame if the checkpoint path ever stops reporting observations
      val metric: Map[String, Any] = try {
        import scala.concurrent.duration._
        scala.concurrent.Await.result(
          scala.concurrent.Future(obs.get)(scala.concurrent.ExecutionContext.global),
          5.seconds)
      } catch { case _: java.util.concurrent.TimeoutException => Map.empty }
      changed = metric.get("changed") match {
        case Some(v: Long) => v
        case _ => next.filter(col("comp2") < col("comp")).count()
      }
      labels = next.select(col("id"), col("comp2").as("comp"))
      i += 1
    }
    require(changed == 0, s"components did not converge within $maxIter rounds")
    (labels, i)
  }

  /** Apply dup clusters to the corpus: keep ONE document per cluster (the
    * canonical min-id member [[components]] labels with itself) and drop
    * the rest — the removal step a dedup pipeline runs after clustering.
    * One anti-join against the (small) non-canonical member list.
    */
  def applyClusters(df: DataFrame, clusters: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    // broadcast the removal list (guide §3.1): it is bounded by the
    // capped candidate-pair graph, while the plain anti-join SHUFFLED THE
    // CORPUS by id against it (the checkpointed cluster frame reports no
    // stats, so the planner defaulted to sort-merge). A corpus whose
    // removal list outgrows broadcast has a duplicate rate where
    // keep-one-per-cluster is the wrong tool long before the join breaks.
    df.join(broadcast(clusters.filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))), Seq(idCol), "left_anti")

  /** Cluster-aware KEEP-BEST dedup apply — the curation policy real
    * pipelines want over [[applyClusters]]'s keep-canonical-id: within
    * each near-dup cluster keep the member with the HIGHEST quality
    * score (ties by lowest id), drop the rest; docs in no cluster
    * survive untouched. `scored` carries (idCol, scoreCol) — any
    * deterministic per-doc score ([[TextOps.qualityLr]]'s rounded logit
    * in the catalog row, so the choice replays bit-identically in an
    * external engine). Scale shape: one equi-join of cluster labels to
    * scores, one map-side-combined argmax per component (one row per
    * cluster reaches the shuffle), one anti-join — all keyed, nothing
    * pairwise beyond what the pairs stage already bounded.
    */
  def applyClustersKeepBest(df: DataFrame, clusters: DataFrame,
      scored: DataFrame, idCol: String = "doc_id",
      scoreCol: String = "score"): DataFrame = {
    // cluster labels broadcast into the score join (guide §3.1): `scored`
    // is corpus-sized (a quality score per doc) and was SHUFFLED by id to
    // meet the label table — the small side by construction (members of
    // capped candidate clusters)
    val labeled = scored.select(col(idCol), col(scoreCol).as("__q"))
      .join(broadcast(clusters.select(col("id").as(idCol), col("comp"))), Seq(idCol))
    val best = labeled.groupBy(col("comp"))
      .agg(max_by(col(idCol),
        struct(col("__q"), (-col(idCol)).as("__t"))).as("__keep"))
    val removed = labeled.join(best, Seq("comp"))
      .filter(col(idCol) =!= col("__keep"))
      .select(col(idCol))
    // removal list is a subset of the label table — same broadcast bound
    df.join(broadcast(removed), Seq(idCol), "left_anti")
  }

  /** SimHash signature (`bits`-wide, ≤ 48): per token-with-multiplicity,
    * ±1 vote per bit of the token hash; sign vector packed into a long.
    */
  def simhash(df: DataFrame, textCol: String, bits: Int = 32): DataFrame = {
    require(bits <= 48, "hash48 provides 48 usable bits")
    val tok = graft.GraftSession.spread(
      df.select(col("doc_id"), df(textCol).as("__text")))
      .select(col("doc_id"), explode(split(lower(col("__text")), " +")).as("w"))
      .withColumn("h", hash48(col("w"), 0))
    val votes = (0 until bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b")
    }
    val agg = tok.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val sig = (0 until bits).map { b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce(_ + _)
    agg.select(col("doc_id"), sig.as("simhash"))
  }

  /** Near-dup pairs by SimHash hamming distance ≤ maxDist, via banded
    * bucket joins — NOT an all-pairs comparison. The signature is cut into
    * `bands` equal bit-slices; by pigeonhole, two signatures within
    * `maxDist < bands` differing bits agree exactly on ≥1 slice, so
    * candidate generation is an equi-join on (band, slice value) and the
    * exact `bit_count(xor)` check only runs on co-bucketed pairs. This is
    * the shape that survives 100 TB: shuffle keyed by band value, no
    * cartesian product.
    */
  def simhashPairs(df: DataFrame, textCol: String, bits: Int = 32,
      maxDist: Int = 3, bands: Int = 4): DataFrame = {
    require(maxDist < bands,
      s"pigeonhole guarantee needs maxDist < bands (got $maxDist >= $bands)")
    require(bits % bands == 0, "bands must evenly divide the signature width")
    val bandBits = bits / bands
    val mask = (1L << bandBits) - 1
    // one row per doc — materialize so the token explode + bit votes run
    // once instead of per self-join side
    val s = graft.GraftSession.materialize(simhash(df, textCol, bits))
    val banded = s.select(col("doc_id"), col("simhash"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask)).as("bval"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band"), col("bb.bval"))
    val l = banded.select(col("band"), col("bval"),
      col("doc_id").as("a"), col("simhash").as("ha"))
    val r = banded.select(col("band"), col("bval"),
      col("doc_id").as("b"), col("simhash").as("hb"))
    l.join(r, Seq("band", "bval")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("ha"), col("hb")).distinct()
      .withColumn("dist", bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("a"), col("b"), col("dist"))
  }
}
