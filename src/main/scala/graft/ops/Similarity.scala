package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — one broadcast of the (small) query
  * set against a full scan of the corpus; correct at any corpus size, cost
  * linear per query.
  *
  * Scale path: LSH bucketing (random-hyperplane signs) so candidate
  * generation is a bucket join instead of a cross join; brute-force rerank
  * inside buckets. Planes are derived from md5 (deterministic, no RNG
  * state).
  */
object Similarity {

  /** dot product of two array columns in double precision — a native
    * codegen'd [[DotProduct]] expression (same left-fold semantics as the
    * zip_with/aggregate HOF formulation it replaces, ~10× faster
    * interpreted-vs-fused and codegen-compatible)
    */
  def dot(a: Column, b: Column): Column = DotProduct.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query row (small set, broadcast),
    * the k nearest corpus rows by cosine; ties broken by corpus id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb")))
    val c = corpus.select(col("vec_id"), col("embedding"))
    val scored = c.crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 6).as("sim"),
        col("rk").cast("long").as("rk"))
  }

  /** deterministic pseudo-random hyperplane component in [-0.5, 0.5) for
    * (plane p, dimension i): md5-derived, computed once driver-side — the
    * plane is a plan-time constant folded into the expression, not hashed
    * per row.
    */
  private def planeComponent(p: Int, i: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane$p|$i".getBytes("UTF-8"))
    val hex = digest.take(6).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 281474976710656.0 - 0.5 // 2^48
  }

  /** deterministic (j, i) projection weight — the same md5-uniform
    * family as [[planeComponent]] under a distinct name space, so the
    * projection matrix is independent of the LSH planes */
  private def projComponent(j: Int, i: Int): Double = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"proj$j|$i".getBytes("UTF-8"))
    val hex = digest.take(6).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 281474976710656.0 - 0.5
  }

  /** Johnson–Lindenstrauss random projection — the dimensionality
    * reduction that keeps ANN / SemDeDup affordable when raw dims are
    * large: distances survive within 1±ε for outDims = O(log n / ε²)
    * whatever the input dimensionality (JL lemma; Achlioptas 2003 shows
    * simple sub-Gaussian entries suffice — public results). The matrix
    * is md5-seeded uniform(−0.5, 0.5) (variance 1/12), scaled by
    * √(12/outDims) so expected squared norms are preserved, and every
    * output coordinate is ONE native codegen'd dot against a plan-time
    * literal row — outDims dots per vector, shuffle-free, and the whole
    * projection replays bit-for-bit in an external engine (ordered
    * folds, deterministic weights). Adds a `proj` array<double> column.
    */
  def randomProject(df: DataFrame, outDims: Int,
      embCol: String = "embedding", dims: Int = 64): DataFrame = {
    val scale = math.sqrt(12.0 / outDims)
    // fail loudly on a width mismatch instead of silently zipping against
    // missing weight components (a wrong-dims corpus would otherwise
    // project through nulls and rank garbage) — but a NULL embedding is
    // data, not a schema error: it passes through to a NULL proj as it
    // did before the guard existed (ADVICE r12: size(NULL) is NULL, so
    // the otherwise-branch used to raise with a NULL message on any
    // missing-embedding row)
    val guarded = when(col(embCol).isNull, lit(null).cast(df.schema(embCol).dataType))
      .when(size(col(embCol)) === dims, col(embCol))
      .otherwise(raise_error(concat(
        lit(s"randomProject: embedding length "),
        size(col(embCol)).cast("string"), lit(s" != dims=$dims"))))
    val g = df.withColumn("__emb_ck", guarded)
    val coords = (0 until outDims).map { j =>
      val row = lit((0 until dims).map(i => projComponent(j, i)).toArray)
      dot(col("__emb_ck"), row) * scale
    }
    // no otherwise-branch: a NULL embedding yields a NULL proj (not an
    // array OF nulls, which would rank as garbage downstream)
    g.withColumn("proj", when(col("__emb_ck").isNotNull, array(coords: _*)))
      .drop("__emb_ck")
  }

  /** Two-stage ANN through the JL projection ([[randomProject]]): score
    * the corpus in `outDims`-d projected space (cheap — 16-d dots
    * instead of raw-d), keep a `shortlist` per query, then rerank ONLY
    * the shortlist by exact cosine in the original space. The standard
    * reduce-then-rerank shape: at scale the projected pass is the
    * linear scan (outDims/dims of the FLOP cost) and exact work is
    * bounded by shortlist × queries. Deterministic end-to-end (both
    * ranks tie-break on vec_id; the projection is md5-seeded), so an
    * external engine replays the exact candidate sets.
    */
  def jlTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      shortlist: Int = 20, outDims: Int = 16, dims: Int = 64): DataFrame = {
    val c = randomProject(corpus, outDims, dims = dims)
      .select(col("vec_id"), col("embedding"), col("proj"))
    val q = broadcast(randomProject(queries, outDims, dims = dims)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("proj").as("q_proj")))
    val scored = c.crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("psim", cosine(col("q_proj"), col("proj")))
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("psim").desc, col("vec_id").asc)
    val short = scored.withColumn("prk", row_number().over(w1))
      .filter(col("prk") <= shortlist)
      .withColumn("sim", cosine(col("q_emb"), col("embedding")))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    short.withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 6).as("sim"))
  }

  /** sign bit of v · plane_p. The plane is ONE array Literal (not an
    * `array(lit, lit, …)` constructor): 64 inline literal nodes per plane
    * × planes × tables bloat the expression tree and the generated Java
    * to the point where Janino compilation dominates the query.
    */
  private def planeBit(emb: Column, p: Int, dims: Int): Column = {
    val plane = lit((0 until dims).map(i => planeComponent(p, i)).toArray)
    when(dot(emb, plane) >= 0, lit(1)).otherwise(lit(0))
  }

  /** nPlanes-bit LSH bucket id using planes [planeOffset, planeOffset+nPlanes):
    * bucket bit b comes from plane planeOffset+b, so different offsets give
    * genuinely disjoint plane families (independent hash tables).
    */
  def lshBucketAt(emb: Column, planeOffset: Int, nPlanes: Int, dims: Int): Column =
    (0 until nPlanes).map(b => planeBit(emb, planeOffset + b, dims) * lit(1 << b))
      .reduce((a, b) => a + b)

  /** nPlanes-bit LSH bucket id for an embedding of known dimensionality */
  def lshBucket(emb: Column, nPlanes: Int = 8, dims: Int = 64): Column =
    lshBucketAt(emb, 0, nPlanes, dims)

  /** Plane count for a corpus of `n` vectors targeting ~`occupancy`
    * vectors per bucket: smallest p with 2^p ≥ n/occupancy, clamped to
    * [minPlanes, maxPlanes]. Expected candidate volume is then
    * O(n · occupancy · tables) — LINEAR in corpus size — where a fixed
    * plane count degrades to O(n²/2^p). The cap bounds per-row signature
    * cost at huge n; recover the recall lost to extra planes by raising
    * `tables` (each table is an independent disjoint plane family).
    * Integer bit-length arithmetic (not floating log2) so the DuckDB
    * oracle's ceil(log2(...)) replay can't drift at power-of-two
    * boundaries.
    */
  def planesFor(n: Long, occupancy: Long = 16L, minPlanes: Int = 4,
      maxPlanes: Int = 18): Int = {
    val buckets = math.max(1L, (n + occupancy - 1) / occupancy)
    val np = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, buckets - 1))
    math.min(maxPlanes, math.max(minPlanes, np))
  }

  /** [[nearDupPairs]] with the plane count derived from the corpus size —
    * the one-count() here is a plan-time statistic (same spirit as AQE's
    * runtime stats), paid once so candidate volume stays linear in n.
    */
  def nearDupPairsAuto(corpus: DataFrame, minSim: Double, tables: Int = 4,
      dims: Int = 64, occupancy: Long = 16L): DataFrame =
    nearDupPairs(corpus, minSim, planesFor(corpus.count(), occupancy), tables, dims)

  /** Embedding-cosine near-duplicate PAIRS — dedup over the embedding
    * space: candidate pairs share an LSH bucket in ≥1 table (bucket
    * equi-join, never all-pairs), exact cosine rerank keeps pairs ≥
    * minSim. Same 100 TB shape as the banded text dedups: shuffle keyed
    * by bucket, exact check only on co-bucketed candidates. Recall < 1 by
    * design (LSH); raise `tables` for higher recall. Size `nPlanes` with
    * [[planesFor]] (or call [[nearDupPairsAuto]]) — a constant plane
    * count is a scale bug, not a tuning choice.
    */
  def nearDupPairs(corpus: DataFrame, minSim: Double, nPlanes: Int = 4,
      tables: Int = 4, dims: Int = 64): DataFrame = {
    // materialize the signature pass ONCE: the (vec_id, bucket) frame is
    // tiny (n·tables rows) but the signature expression behind it is the
    // expensive part (planes·dims multiply-adds per row), and a plain
    // self-join would recompute it for each side
    val b = graft.GraftSession.materialize(
      corpus.select(col("vec_id"),
        explode(array((0 until tables).map(t =>
          concat_ws(":", lit(t),
            lshBucketAt(col("embedding"), t * nPlanes, nPlanes, dims))): _*))
          .as("bucket")))
    val l = b.select(col("bucket"), col("vec_id").as("a"))
    val r = b.select(col("bucket"), col("vec_id").as("b"))
    // dedup candidate pairs on ids only — carrying the embedding arrays
    // through the candidate shuffle is the expensive part at scale — then
    // re-attach vectors by id (AQE broadcasts the corpus projection when it
    // is small; at scale this is a key join, never a forced broadcast)
    val cands = l.join(r, Seq("bucket")).filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
    // norms once per VECTOR (not per candidate pair): the rerank is the hot
    // loop and the norm is two-thirds of a naive cosine's work
    val vecs = corpus.select(col("vec_id"), col("embedding"),
      norm(col("embedding")).as("__nrm"))
    cands
      .join(vecs.select(col("vec_id").as("a"), col("embedding").as("ea"),
        col("__nrm").as("__na")), Seq("a"))
      .join(vecs.select(col("vec_id").as("b"), col("embedding").as("eb"),
        col("__nrm").as("__nb")), Seq("b"))
      .withColumn("sim", dot(col("ea"), col("eb")) / (col("__na") * col("__nb")))
      .filter(col("sim") >= minSim)
      .select(col("a"), col("b"), round(col("sim"), 6).as("sim"))
  }

  /** Centroid count for an IVF index over `n` vectors: the classic √n
    * sizing, rounded up to a power of two with integer bit-length math
    * (clamped to [4, 4096]) so a SQL oracle can replay it via
    * ceil(log2(ceil(sqrt(n)))) without float-boundary drift. List length
    * is then ~√n, so probe cost per query is O(√n · nProbe).
    */
  def centroidsFor(n: Long): Int = {
    val root = math.ceil(math.sqrt(math.max(1L, n).toDouble)).toLong
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, root - 1))
    math.min(4096, math.max(4, 1 << bits.toInt))
  }

  /** IVF(-flat) approximate nearest neighbors — the second scale path
    * besides [[lshTopK]]: a deterministic coarse quantizer (the md5-ranked
    * lowest-C corpus vectors serve as centroids — a reproducible pseudo-
    * random sample, no RNG state), inverted lists keyed by each vector's
    * nearest centroid, queries probe the `nProbe` nearest lists and rerank
    * candidates by exact cosine. At scale: centroid assignment is one
    * broadcast-C map pass over the corpus (linear, no shuffle of vectors),
    * the probe is a centroid-id equi-join against lists of ~√n vectors, and
    * recall rises with nProbe. centroids=0 sizes the quantizer from a
    * corpus count (plan-time statistic, same spirit as AQE stats).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: Int = 0, nProbe: Int = 4): DataFrame =
    ivfCore(corpus, queries, k, sampledCentroids(corpus, centroids), nProbe)

  /** IVF with Lloyd-refined centroids: the same deterministic sample seeds
    * `iters` k-means iterations (assign → per-dimension mean), then the
    * standard list/probe/rerank runs against the refined quantizer.
    * Better-balanced lists ⇒ higher recall per probe than the raw sample.
    * Each iteration costs one broadcast-assign map pass plus ONE shuffle of
    * (dims · n) scalar rows for the means — linear, no pairwise work; the
    * refined centroid set stays a broadcast. Oracle-gated since the means
    * collapse to FLOAT (see [[lloydCentroids]]) — the 24-bit grid absorbs
    * summation-order ulp noise, so DuckDB replays the refined centroids
    * bit-exactly. Clusters that lose every member drop out (standard k-means
    * behavior; the quantizer just gets smaller).
    */
  def ivfTopKLloyd(corpus: DataFrame, queries: DataFrame, k: Int,
      centroids: Int = 0, nProbe: Int = 4, iters: Int = 2): DataFrame = {
    val vecs = corpus.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val cents = lloydCentroids(vecs, sampledCentroids(corpus, centroids), iters)
    ivfCore(corpus, queries, k, cents, nProbe)
  }

  /** `iters` Lloyd rounds (assign → per-dimension mean) from a given
    * centroid seed set. Each round is one broadcast-assign map pass plus
    * one shuffle of (dims · n) scalar rows for the means; the means are
    * collapsed to FLOAT (IEEE round-to-nearest-even) so avg()'s
    * summation-order ulp noise lands on a 24-bit grid any engine
    * reproduces — the cast is what makes Lloyd oracle-replayable.
    */
  private def lloydCentroids(vecs: DataFrame, seed: DataFrame,
      iters: Int): DataFrame = {
    var cents = seed
    for (_ <- 1 to iters) {
      val assigned = assignNearest(vecs, cents, 1)
      val means = assigned
        .select(col("cid"), posexplode(col("emb")).as(Seq("pos", "v")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("v")).as("m"))
        .groupBy(col("cid")).agg(
          transform(array_sort(collect_list(struct(col("pos"), col("m")))),
            s => s.getField("m").cast("float")).as("cemb"))
      cents = broadcast(means)
    }
    cents
  }

  /** K-means clustering as a first-class curation operator (the cluster
    * stage SemDeDup / DSIR-style pipelines start from): md5-ranked seed
    * sample, `iters` Lloyd rounds ([[lloydCentroids]]), final nearest-
    * centroid assignment, then per-cluster stats. Scale shape: every
    * assign pass is a broadcast-centroid map over the corpus whose
    * id×C product is combined MAP-SIDE by the partial-aggregated argmax
    * (one row per vector reaches the shuffle); the mean step shuffles
    * (dims · n) scalars. No pairwise work anywhere, so the operator is
    * linear in corpus size at fixed C — the 1000-executor path is the
    * same plan with more partitions. The per-cluster mean cosine runs as
    * an ORDERED fold over (vec_id, sim) so the float sum is bit-stable
    * across engines ([[graft.promql]]'s stddev_over_time lesson).
    */
  /** Leave-one-out 1-NN label evaluation — the embedding-quality
    * diagnostic a curation pipeline runs before trusting a labeled
    * embedding space (are same-label points actually neighbors?): per
    * label, how many points' nearest OTHER point (cosine, ties by id)
    * carries the same label. Brute-force all-pairs with the whole set
    * broadcast — by construction an EVAL-SET operator (eval sets are
    * thousands of rows, not the corpus; at corpus scale feed a sampled
    * subset or rank through the IVF/JL ANN paths instead). Float
    * discipline: [[cosine]]'s native left-fold dot product — the same
    * fold the kmeans oracle replays with `list_sum(list_transform(...))`
    * — and the accuracy is ONE int/int division (exact-rounded, engine-
    * identical).
    */
  def knnLabelEval(emb: DataFrame): DataFrame = {
    // norms bound ONCE per side (sqrt is correctly rounded, so the
    // precomputed factor is bit-identical to the per-pair inline form the
    // oracle replays) — 3 native dots per pair become 1.
    // spread: the n·n dot pass is compute-dense vs input bytes and the
    // probe side otherwise inherits the scan's partitioning (ONE task for
    // a small parquet file — measured 3.6 s in a single task at sf0.1).
    // Partitioning cannot move a bit here: __sim is a pure per-pair
    // function and the argmax key (sim, −nid) is totally ordered
    // (GraftSession.spread — no-op at scale).
    val a = graft.GraftSession.spread(
      emb.select(col("vec_id"), col("embedding"), col("label")))
      .withColumn("__na", norm(col("embedding")))
    val b = broadcast(emb.select(col("vec_id").as("nid"),
      col("embedding").as("nemb"), col("label").as("nlabel"))
      .withColumn("__nb", norm(col("nemb"))))
    val scored = a.crossJoin(b)
      .filter(col("vec_id") =!= col("nid"))
      .withColumn("__sim",
        dot(col("embedding"), col("nemb")) / (col("__na") * col("__nb")))
    // argmax per vec_id via map-side-combined max_by over a totally
    // ordered (sim, −nid) key — no n²-row window shuffle; equal to the
    // oracle's row_number over (sim DESC, nid ASC)
    scored.groupBy(col("vec_id"), col("label"))
      .agg(max_by(col("nlabel"),
        struct(col("__sim"), (-col("nid")).as("__t"))).as("nlabel"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum((col("nlabel") === col("label")).cast("long")).as("n_correct"))
      .withColumn("acc",
        col("n_correct").cast("double") / col("n").cast("double"))
  }

  /** Sampled-query 1-NN label evaluation — the corpus-scale shape of
    * [[knnLabelEval]]. The exact leave-one-out eval is O(n²) cosines by
    * construction, but the ESTIMATE it produces doesn't need the whole
    * corpus on the query side: take the `m` md5-ranked lowest vec_ids
    * (the same deterministic no-RNG sample [[ivfTopK]]'s quantizer
    * uses), keep the FULL corpus as the neighbor side, and the job is
    * one broadcast-m map pass over the corpus — O(n·m) with m fixed, so
    * 100× the corpus is 100× the work, not 10 000×. The map-side-
    * combined argmax carries m rows to the shuffle. Float discipline
    * identical to the exact row (norms bound once, native left-fold
    * dot, int/int accuracy division).
    */
  def knnLabelEvalSampled(emb: DataFrame, m: Int = 64): DataFrame = {
    val q = broadcast(emb.select(col("vec_id"), col("embedding"), col("label"))
      .withColumn("__r", md5(col("vec_id").cast("string")))
      .orderBy(col("__r"), col("vec_id")).limit(m).drop("__r")
      .withColumn("__na", norm(col("embedding"))))
    // no spread on the corpus side (r18 bench): at m=64 the O(n·m) pass is
    // light enough that the extra exchange cost exceeded the parallelism
    // win (0.48 s bare vs 0.72 s spread at sf0.1)
    val c = emb.select(col("vec_id").as("nid"), col("embedding").as("nemb"),
      col("label").as("nlabel"))
      .withColumn("__nb", norm(col("nemb")))
    val scored = c.crossJoin(q)
      .filter(col("vec_id") =!= col("nid"))
      .withColumn("__sim",
        dot(col("embedding"), col("nemb")) / (col("__na") * col("__nb")))
    scored.groupBy(col("vec_id"), col("label"))
      .agg(max_by(col("nlabel"),
        struct(col("__sim"), (-col("nid")).as("__t"))).as("nlabel"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum((col("nlabel") === col("label")).cast("long")).as("n_correct"))
      .withColumn("acc",
        col("n_correct").cast("double") / col("n").cast("double"))
  }

  /** ANN-shortlist + exact-rerank 1-NN label evaluation — the third
    * rung: the sampled eval still scans the full corpus per query; at
    * billions of vectors the neighbor side should come from the ANN
    * index instead. Shortlist = [[ivfTopK]] (probed-list candidates,
    * exact cosines inside the probed cells), then an exact rerank of
    * the ≤ m·shortK shortlist rows recomputes the raw cosine with the
    * same norm-bound fold as [[knnLabelEval]] and takes the (sim DESC,
    * nid ASC) argmax. Cost: the IVF probe (~nProbe/C of the corpus per
    * query) + a broadcast join of the bounded shortlist — nothing
    * quadratic anywhere. Recall follows the IVF quantizer; with
    * nProbe = C it degenerates to the sampled-exact answer
    * (SimilaritySpec pins exactly that equivalence).
    */
  def knnLabelEvalAnn(emb: DataFrame, m: Int = 64, shortK: Int = 8,
      centroids: Int = 0, nProbe: Int = 4): DataFrame = {
    val q = emb.select(col("vec_id"), col("embedding"), col("label"))
      .withColumn("__r", md5(col("vec_id").cast("string")))
      .orderBy(col("__r"), col("vec_id")).limit(m).drop("__r")
    val short = ivfTopK(emb, q, shortK, centroids, nProbe)
      .select(col("query_id"), col("vec_id").as("nid"))
    // exact rerank over the bounded shortlist: re-attach both embeddings
    // (query side is m rows — broadcast; neighbor side is an equi-join
    // on vec_id into the corpus) and redo the exact-cosine argmax
    val qSide = broadcast(q
      .select(col("vec_id").as("query_id"), col("embedding"), col("label"))
      .withColumn("__na", norm(col("embedding"))))
    val nSide = emb.select(col("vec_id").as("nid"),
      col("embedding").as("nemb"), col("label").as("nlabel"))
      .withColumn("__nb", norm(col("nemb")))
    short.join(qSide, Seq("query_id")).join(nSide, Seq("nid"))
      .withColumn("__sim",
        dot(col("embedding"), col("nemb")) / (col("__na") * col("__nb")))
      .groupBy(col("query_id"), col("label"))
      .agg(max_by(col("nlabel"),
        struct(col("__sim"), (-col("nid")).as("__t"))).as("nlabel"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum((col("nlabel") === col("label")).cast("long")).as("n_correct"))
      .withColumn("acc",
        col("n_correct").cast("double") / col("n").cast("double"))
  }

  /** Greedy k-center coreset (farthest-first traversal, Gonzalez '85):
    * select k corpus vectors so every vector is within the returned
    * `radius` of a selected one — the 2-approximation to optimal k-center
    * and the standard diverse-subset / coverage-sampling primitive a
    * curation pipeline runs to pick demonstration sets, eval anchors, or
    * cluster seeds that SPAN the embedding space instead of sampling its
    * dense core. Deterministic end-to-end: the seed is the min-md5
    * vec_id, each round's pick is the (max min-distance, then min
    * vec_id) argmax, distance = 1 − ordered-fold [[cosine]] so both
    * engines fold identical doubles.
    *
    * Scale shape: k driver-side rows total. Each round recomputes
    * min-distance against the ≤ k-row broadcast selected set and takes
    * ONE row via TakeOrdered — O(k²·n) cosine evals, no shuffle of the
    * corpus, no quadratic pair stage; the loop is k bounded statistics,
    * not a collect of the corpus.
    *
    * Returns (sel_idx 1..k, vec_id, radius) where radius is the picked
    * vector's min-distance at selection time (the coverage radius
    * sequence, non-increasing; NULL for the seed).
    */
  def kcenterCoreset(corpus: DataFrame, k: Int = 8): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // the greedy loop scans the corpus k−1 times: pin it once instead of
    // re-reading the source every round
    val base = corpus.select(col("vec_id"), col("embedding")).cache()
    try {
      val seedRow = base
        .orderBy(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
        .limit(1).select(col("vec_id")).collect()
      require(seedRow.nonEmpty, "kcenterCoreset: empty corpus")
      val sel = scala.collection.mutable.Buffer[(Long, Long, Option[Double])](
        (1L, seedRow.head.getLong(0), None))
      var exhausted = false
      for (i <- 2 to k if !exhausted) {
        val ids = sel.map(_._2).toSeq
        val centers = broadcast(base.filter(col("vec_id").isin(ids: _*))
          .select(col("vec_id").as("cid"), col("embedding").as("cemb")))
        val pick = base.filter(!col("vec_id").isin(ids: _*))
          .crossJoin(centers)
          .withColumn("__d", lit(1.0) - cosine(col("embedding"), col("cemb")))
          .groupBy(col("vec_id")).agg(min(col("__d")).as("dmin"))
          .orderBy(col("dmin").desc, col("vec_id").asc)
          .limit(1).collect()
        // k larger than the corpus: return every selectable vector rather
        // than throwing on the empty argmax
        if (pick.isEmpty) exhausted = true
        else sel += ((i.toLong, pick.head.getLong(0), Some(pick.head.getDouble(1))))
      }
      sel.toSeq.toDF("sel_idx", "vec_id", "radius")
    } finally base.unpersist(blocking = false)
  }

  def kmeansStats(corpus: DataFrame, centroids: Int = 0,
      iters: Int = 2): DataFrame = {
    // NOTE the whole Lloyd chain is ONE lazy DAG (iters+1 occurrences of
    // the projected scan): at real scale the caller caches the projected
    // corpus before calling; forcing a cache here measured SLOWER than
    // the rescans at catalog size, so the op stays lazy
    val vecs = corpus.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val cents = lloydCentroids(vecs, sampledCentroids(corpus, centroids), iters)
    val assigned = assignNearest(vecs, cents, 1)
    val withSim = assigned.join(broadcast(cents), "cid")
      .withColumn("__sim", cosine(col("emb"), col("cemb")))
    withSim.groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"), min(col("id")).as("min_member"),
        aggregate(
          transform(array_sort(collect_list(struct(col("id"), col("__sim")))),
            s => s.getField("__sim")),
          lit(0.0), (a, v) => a + v).as("__s"))
      .select(col("cid"), col("n_members"), col("min_member"),
        round(col("__s") / col("n_members").cast("double"), 6).as("mean_csim"))
  }

  /** the md5-ranked lowest-C corpus vectors — a reproducible pseudo-random
    * centroid sample, no RNG state
    */
  private def sampledCentroids(corpus: DataFrame, centroids: Int): DataFrame = {
    val c = if (centroids > 0) centroids else centroidsFor(corpus.count())
    broadcast(
      corpus.select(col("vec_id"), col("embedding"))
        .withColumn("__r", md5(col("vec_id").cast("string")))
        .orderBy(col("__r"), col("vec_id"))
        .limit(c)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb")))
  }

  /** nearest `p` centroids of each (id, emb): broadcast the tiny centroid
    * set, rank per id by cosine (ties by centroid id — deterministic)
    */
  private def assignNearest(df: DataFrame, cents: DataFrame, p: Int): DataFrame = {
    val scored = df.crossJoin(cents)
      .withColumn("__csim", cosine(col("emb"), col("cemb")))
    if (p == 1) {
      // argmax needs no window: a partial-aggregated groupBy combines the
      // id×C product map-side, so the shuffle carries ONE row per vector
      // instead of the full C-wide cross product through a sort. Tie-break
      // matches the window form exactly: highest sim, then lowest cid
      // ((sim, -cid) max ≡ (sim desc, cid asc) rank 1).
      scored.groupBy(col("id"))
        .agg(max(struct(col("__csim"), (-col("cid")).as("__nc"),
          col("cid"), col("emb"))).as("__top"))
        .select(col("id"), col("__top.emb").as("emb"), col("__top.cid").as("cid"))
    } else {
      val w = Window.partitionBy(col("id"))
        .orderBy(col("__csim").desc, col("cid").asc)
      scored.withColumn("__crk", row_number().over(w))
        .filter(col("__crk") <= p)
        .select(col("id"), col("emb"), col("cid"))
    }
  }

  /** Persist an IVF index to disk: `centroids/` (cid, cemb) plus `lists/`
    * PARTITIONED BY the centroid id — the write-once index layout that
    * makes query-time probing a PARTITION-PRUNED read (only the nProbe
    * lists a query ranks are ever read off disk, ~nProbe/C of the corpus
    * bytes; the [[graft.ops.SignatureStore]] pattern applied to ANN).
    * The quantizer is the same deterministic md5-ranked sample
    * [[ivfTopK]] uses, so a query through the stored index is
    * bit-identical to the in-memory path — the catalog row reuses the
    * ivf oracle verbatim.
    *
    * GENERATIONS (r13 VERDICT #1): every rebuild lands in a fresh
    * `gen-NNNNN/` subdirectory beside the live one and `meta.json`'s
    * `generation` pointer flips to it with ONE atomic rename — the
    * Iceberg/Delta pointer-commit move. Readers resolve the pointer at
    * entry ([[ivfDataRoot]]) and never observe a missing root: the
    * superseded generation stays on disk for a grace period (until the
    * next [[maintainIvfIndex]] entry) so probes that resolved before a
    * flip finish against their snapshot. A crash mid-build leaves the
    * pointer untouched — the half-written next generation is deleted
    * and rebuilt on the next attempt.
    */
  def buildIvfIndex(corpus: DataFrame, dir: String, centroids: Int = 0): Unit = {
    val spark = corpus.sparkSession
    val next = readIvfGeneration(spark, dir) + 1
    val root = s"$dir/${genDirName(next)}"
    val (fs, rootP) = fsPath(spark, root)
    fs.delete(rootP, true) // a crashed earlier attempt at this generation
    val cents = sampledCentroids(corpus, centroids)
    cents.write.mode("overwrite").parquet(s"$root/centroids")
    assignNearest(
      corpus.select(col("vec_id").as("id"), col("embedding").as("emb")), cents, 1)
      .select(col("id"), col("emb"), col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$root/lists")
    writeIvfMeta(spark, dir, next)
    sweepIvfGenerations(spark, dir, cur = next, graceBelow = next - 1)
  }

  private def genDirName(gen: Long): String = f"gen-$gen%05d"

  private def fsPath(spark: org.apache.spark.sql.SparkSession,
      p: String): (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val path = new org.apache.hadoop.fs.Path(p)
    (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
  }

  /** the `generation` field of `dir/meta.json`; 0 = no pointer yet (a
    * fresh dir, or a pre-generation flat index: `centroids/` + `lists/`
    * directly under `dir`, which readers keep serving unchanged)
    */
  private[graft] def readIvfGeneration(
      spark: org.apache.spark.sql.SparkSession, dir: String): Long = {
    recoverLegacySwap(spark, dir)
    val (fs, metaP) = fsPath(spark, s"$dir/meta.json")
    if (!fs.exists(metaP)) 0L
    else {
      // The pointer flip renames .meta.json.tmp over meta.json — atomic
      // for the DATA file on every FS — but Hadoop's local ChecksumFs
      // moves the data file and its .crc sidecar in TWO steps, so a
      // reader landing inside that window verifies new bytes against the
      // old checksum and throws ChecksumException (caught live by the
      // StreamingSpec concurrent re-cluster test). The window is
      // microseconds and self-heals on the next open; retry a few times
      // before surfacing. S3A/HDFS have no sidecar — the retry never
      // fires there.
      var attempt = 0
      var txt: String = null
      while (txt == null) {
        try {
          val in = fs.open(metaP)
          txt = try {
            val bs = new java.io.ByteArrayOutputStream()
            org.apache.hadoop.io.IOUtils.copyBytes(in, bs, 8192, false)
            bs.toString("UTF-8")
          } finally in.close()
        } catch {
          case e: org.apache.hadoop.fs.ChecksumException =>
            attempt += 1
            if (attempt > 5) throw e
            Thread.sleep(10L * attempt)
        }
      }
      "\"generation\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt)
        .map(_.group(1).toLong).getOrElse(0L)
    }
  }

  /** resolve the pointer to the directory holding the live
    * `centroids/` + `lists/` — every read/append/compact path enters
    * through here, so a concurrent pointer flip is invisible (the old
    * generation outlives the flip by one maintenance grace period)
    */
  private[graft] def ivfDataRoot(spark: org.apache.spark.sql.SparkSession,
      dir: String): String = {
    val gen = readIvfGeneration(spark, dir)
    if (gen == 0L) dir else s"$dir/${genDirName(gen)}"
  }

  /** delete superseded generations: everything below `graceBelow` (and
    * the pre-generation flat layout once `graceBelow` > 0), never the
    * current pointer target. `graceBelow = cur - 1` right after a flip
    * (one generation of grace for in-flight readers); `graceBelow = cur`
    * at maintenance entry (grace expired).
    */
  private def sweepIvfGenerations(spark: org.apache.spark.sql.SparkSession,
      dir: String, cur: Long, graceBelow: Long): Unit = {
    val (fs, dirP) = fsPath(spark, dir)
    if (!fs.exists(dirP)) return
    val genRe = "gen-(\\d{5})".r
    fs.listStatus(dirP).foreach { st =>
      st.getPath.getName match {
        case genRe(n) if n.toLong < graceBelow && n.toLong != cur =>
          fs.delete(st.getPath, true)
        case ("centroids" | "lists") if graceBelow > 0L =>
          fs.delete(st.getPath, true)
        case _ => ()
      }
    }
  }

  /** crash recovery for the RETIRED (pre-generation) whole-root rename
    * swap: a process that died between its two renames left the live
    * root missing with the data stranded in `.rebuild_old` — restore it.
    * Kept so old-format indices recover on any read or maintenance entry
    * (r13 ADVICE); new-format maintenance never unroots the directory.
    */
  private def recoverLegacySwap(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val (fs, dirP) = fsPath(spark, dir.stripSuffix("/"))
    if (!fs.exists(dirP)) {
      val oldP = new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + ".rebuild_old")
      if (fs.exists(oldP)) { fs.rename(oldP, dirP); () }
    }
  }

  /** Index balance statistic. `skew` is the largest list relative to the
    * balanced size total/C: 1 = perfectly balanced, C = everything in one
    * list. The probe-read bound degrades linearly with it — a query whose
    * nearest centroid is the hot list reads maxList rows, i.e. skew/C of
    * the corpus instead of 1/C.
    */
  final case class IvfIndexStats(total: Long, centroids: Int, maxList: Long) {
    def skew: Double =
      if (total == 0L) 1.0 else maxList.toDouble * centroids / total
  }

  /** list-size statistics off the stored index: a groupBy over the cid
    * partition column + one bounded (C-row) agg — no embedding bytes read
    */
  def ivfIndexStats(spark: org.apache.spark.sql.SparkSession,
      dir: String): IvfIndexStats =
    statsOverRoot(spark, ivfDataRoot(spark, dir))

  private def statsOverRoot(spark: org.apache.spark.sql.SparkSession,
      root: String): IvfIndexStats = {
    val cents = spark.read.parquet(s"$root/centroids").count().toInt
    val r = spark.read.parquet(s"$root/lists")
      .groupBy(col("cid")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n")), max(col("n"))).head()
    val total = if (r.isNullAt(0)) 0L else r.getLong(0)
    val mx = if (r.isNullAt(1)) 0L else r.getLong(1)
    IvfIndexStats(total, cents, mx)
  }

  /** (re)write `dir/meta.json` — generation pointer + the balance
    * statistics of that generation — through the dir's Hadoop
    * FileSystem (works on hdfs:///s3a:// roots, r13 ADVICE), committed
    * as write-temp + atomic-overwrite-rename so a reader never sees a
    * torn pointer. This rename IS the generation flip.
    */
  private def writeIvfMeta(spark: org.apache.spark.sql.SparkSession,
      dir: String, gen: Long): IvfIndexStats = {
    val root = if (gen == 0L) dir else s"$dir/${genDirName(gen)}"
    val st = statsOverRoot(spark, root)
    val (fs, metaP0) = fsPath(spark, s"$dir/meta.json")
    val metaP = fs.makeQualified(metaP0)
    val tmpP = fs.makeQualified(
      new org.apache.hadoop.fs.Path(s"$dir/.meta.json.tmp"))
    val out = fs.create(tmpP, true)
    try out.write(
      (s"""{"generation":$gen,"centroids":${st.centroids},""" +
        s""""total":${st.total},"max_list":${st.maxList},"skew":${st.skew}}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      metaP.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmpP, metaP, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    st
  }

  /** Compact a [[buildIvfIndex]] directory's lists: incremental appends
    * land one file per (append batch × touched cid) and a long-lived
    * index decays into many tiny files per partition — the classic
    * small-files decay, the probe read's other enemy besides skew.
    * Compaction rewrites the lists one shuffled file per cid partition
    * (rows re-sorted by id inside each list) WITHOUT moving the
    * quantizer: probe answers are bit-identical, only the file layout
    * changes (spec-gated). Reader-safe the same way a re-cluster is: the
    * compacted lists (and a copy of the tiny centroid set) land in
    * generation N+1 beside the live one and the meta pointer flips
    * atomically — a concurrent probe keeps its resolved snapshot, and a
    * crash mid-rewrite leaves the pointer on the intact generation.
    */
  def compactIvfIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val cur = readIvfGeneration(spark, dir)
    val curRoot = if (cur == 0L) dir else s"$dir/${genDirName(cur)}"
    val next = cur + 1
    val nextRoot = s"$dir/${genDirName(next)}"
    val (fs, nextP) = fsPath(spark, nextRoot)
    fs.delete(nextP, true)
    spark.read.parquet(s"$curRoot/centroids")
      .coalesce(1).write.mode("overwrite").parquet(s"$nextRoot/centroids")
    spark.read.parquet(s"$curRoot/lists")
      .repartition(col("cid"))
      .sortWithinPartitions(col("cid"), col("id"))
      .write.mode("overwrite").partitionBy("cid")
      .option("compression", "zstd").parquet(s"$nextRoot/lists")
    writeIvfMeta(spark, dir, next)
    sweepIvfGenerations(spark, dir, cur = next, graceBelow = next - 1)
  }

  /** Drift rule (documented contract, r12 VERDICT #5): appends never move
    * the quantizer, so a skewed delta piles into few lists and the probe
    * read degrades toward a scan (one hot list ≈ skew/C of the corpus).
    * When the stored index's skew exceeds `maxSkew`, RE-CLUSTER: read the
    * current corpus back out of the lists (the index stores the vectors),
    * materialize it off the paths about to be overwritten, and rebuild
    * with fresh sampled centroids — the sample now reflects the grown
    * corpus, so dense append regions receive proportionally many
    * centroids and the balance restores. Returns true when a rebuild
    * happened; callers run it after append batches, and the spec gates
    * that adversarially skewed appends trip it while recall and the
    * probe-read bound recover.
    *
    * LIVE-READER SAFETY (r13 VERDICT #1): the rebuild writes generation
    * N+1 beside the live generation and [[writeIvfMeta]] flips the
    * pointer with one atomic rename, so a concurrent
    * [[ivfTopKFromIndex]] probe or [[graft.streaming.StreamingAnn]]
    * micro-batch racing the maintenance window never sees a missing
    * root: whichever pointer it resolved stays fully on disk until the
    * NEXT maintenance entry sweeps expired generations (the grace
    * period). Spec-gated by a probe stream riding through a forced
    * re-cluster with zero failed batches.
    */
  def maintainIvfIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      maxSkew: Double = 8.0): Boolean = {
    val cur = readIvfGeneration(spark, dir)
    // grace expired for anything superseded before this entry
    sweepIvfGenerations(spark, dir, cur = cur, graceBelow = cur)
    val curRoot = if (cur == 0L) dir else s"$dir/${genDirName(cur)}"
    val st = statsOverRoot(spark, curRoot)
    if (st.total > 0L && st.skew > maxSkew) {
      // the corpus streams straight off the live generation's lists into
      // the next generation's build — two disjoint paths, so the only
      // copy of the store is never overwritten mid-read, and a crash at
      // any point leaves the pointer on the intact current generation
      val corpus = spark.read.parquet(s"$curRoot/lists")
        .select(col("id").as("vec_id"), col("emb").as("embedding"))
      buildIvfIndex(corpus, dir)
      true
    } else false
  }

  /** Incrementally add vectors to a [[buildIvfIndex]] directory: assign
    * the NEW vectors against the STORED centroids (one broadcast map
    * pass over the delta — the existing corpus is never re-read) and
    * append them into their list partitions. The quantizer never moves,
    * so existing list files are untouched and a subsequent
    * [[ivfTopKFromIndex]] sees old + new identically to a fresh build
    * over the union with the same centroids — the incremental-refresh
    * motion [[graft.ops.SignatureStore]] provides for dedup, applied to
    * ANN. (Centroid drift after heavy growth is a rebuild decision, not
    * an append-time concern.)
    */
  def appendToIvfIndex(delta: DataFrame, dir: String): Unit = {
    val spark = delta.sparkSession
    val gen = readIvfGeneration(spark, dir)
    val root = if (gen == 0L) dir else s"$dir/${genDirName(gen)}"
    val cents = broadcast(spark.read.parquet(s"$root/centroids"))
    assignNearest(
      delta.select(col("vec_id").as("id"), col("embedding").as("emb")), cents, 1)
      .select(col("id"), col("emb"), col("cid"))
      .write.mode("append").partitionBy("cid").parquet(s"$root/lists")
    writeIvfMeta(spark, dir, gen) // stats refresh; pointer unchanged
    ()
  }

  /** Serve top-k from a [[buildIvfIndex]] directory. The probe set's
    * centroid ids are a bounded driver statistic (≤ nProbe × |queries|),
    * inlined as a literal IN-list so the lists scan prunes PARTITIONS —
    * the plan reads only the probed lists' files (PlanSpec-gated).
    */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, k: Int, nProbe: Int = 4): DataFrame = {
    // resolve the generation pointer ONCE — centroids, probe assignment
    // and the pruned lists read all come from one consistent snapshot,
    // which stays on disk through any concurrent flip (grace period)
    val root = ivfDataRoot(spark, dir)
    val cents = broadcast(spark.read.parquet(s"$root/centroids"))
    val probes = assignNearest(
      queries.select(col("vec_id").as("id"), col("embedding").as("emb")),
      cents, nProbe)
      .select(col("id").as("query_id"), col("emb").as("q_emb"), col("cid"))
    val probeCids = probes.select(col("cid")).distinct()
      .collect().map(_.getLong(0)).sorted
    // prune on the RAW partition column, then normalize its inferred type
    // (partition-type inference may read small ids back as int)
    val lists = spark.read.parquet(s"$root/lists")
      .filter(col("cid").isin(probeCids: _*))
      .withColumn("cid", col("cid").cast("long"))
    val cands = lists.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("query_id"))
    val scored = cands.withColumn("sim", cosine(col("q_emb"), col("emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("id").as("vec_id"), round(col("sim"), 6).as("sim"))
  }

  private[graft] def ivfCore(corpus: DataFrame, queries: DataFrame, k: Int,
      cents: DataFrame, nProbe: Int): DataFrame = {
    val lists = assignNearest(
      corpus.select(col("vec_id").as("id"), col("embedding").as("emb")), cents, 1)
    val probes = assignNearest(
      queries.select(col("vec_id").as("id"), col("embedding").as("emb")), cents, nProbe)
      .select(col("id").as("query_id"), col("emb").as("q_emb"), col("cid"))
    // each corpus vector lives in exactly ONE list, so a (query, vec) pair
    // can only arise once — no dedup needed on the probe join
    val cands = lists.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("query_id"))
    val scored = cands.withColumn("sim", cosine(col("q_emb"), col("emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("id").as("vec_id"), round(col("sim"), 6).as("sim"))
  }

  /** Product-quantization compressed ANN scan (Jégou/Douze/Schmid, "Product
    * quantization for nearest neighbor search", TPAMI 2011 — public): the
    * third scale path besides [[lshTopK]]/[[ivfTopK]]. Dimensions split
    * into `m` subspaces; each vector's subspace j is ENCODED as the id of
    * its nearest sub-codebook entry (argmin sub-L2², ties to the lowest
    * id), so d float32s become m small ints — at d=64, m=8 that is a 32×
    * reduction in what the candidate scan READS, which is the 100 TB win:
    * ADC scoring touches only the code table, never the embeddings.
    * Queries build an m×ks lookup table of sub-distances once (tiny), and
    * each candidate's approximate distance is m table lookups summed in
    * fixed subspace order (deterministic fold, oracle-replayable).
    *
    * Codebook: the md5-ranked lowest-ks corpus vectors' sub-vectors —
    * the same reproducible pseudo-random sample as [[sampledCentroids]],
    * collected driver-side (ks rows, a plan-time constant) and inlined as
    * literals, so encode and ADC are codegen'd projections with zero joins
    * on the corpus side. Compose with IVF lists to prune the candidate set
    * (IVF-PQ) — here the scan is exhaustive over codes by design.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, ks: Int = 16, dims: Int = 64): DataFrame = {
    val (codes, lut, est) = pqParts(corpus, queries, m, ks, dims)
    val scored = codes.crossJoin(lut)
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("est_d2", est)
    pqRank(scored, k)
  }

  /** IVF-PQ (the FAISS-style production composition): IVF's coarse
    * quantizer prunes the candidate set to the probed inverted lists,
    * then PQ's ADC scores ONLY those candidates from their codes — the
    * scan is ~nProbe/C of the corpus and each touched row costs m table
    * lookups over m small ints. Same deterministic parts as [[ivfTopK]]
    * and [[pqTopK]] (both individually oracle-replayed), composed by an
    * equi-join on the probed centroid ids.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nProbe: Int = 4, m: Int = 8, ks: Int = 16, dims: Int = 64): DataFrame = {
    val cents = sampledCentroids(corpus, 0)
    val lists = assignNearest(
      corpus.select(col("vec_id").as("id"), col("embedding").as("emb")), cents, 1)
      .select(col("id").as("vec_id"), col("cid"))
    val probes = assignNearest(
      queries.select(col("vec_id").as("id"), col("embedding").as("emb")), cents, nProbe)
      .select(col("id").as("query_id"), col("cid"))
    val (codes, lut, est) = pqParts(corpus, queries, m, ks, dims)
    // vec lives in ONE list → a (query, vec) candidate arises at most once
    val cands = lists.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    val scored = cands
      .join(codes, Seq("vec_id"))
      .join(lut, Seq("query_id"))
      .withColumn("est_d2", est)
    pqRank(scored, k)
  }

  /** shared PQ machinery: corpus code table, broadcast query LUTs, and the
    * fixed-subspace-order ADC estimate over (codes, lut)
    */
  private def pqParts(corpus: DataFrame, queries: DataFrame,
      m: Int, ks: Int, dims: Int): (DataFrame, DataFrame, Column) = {
    require(dims % m == 0, s"dims=$dims must split evenly into m=$m subspaces")
    val sub = dims / m
    val sample: Array[Array[Float]] = corpus
      .select(col("vec_id"), col("embedding"))
      .withColumn("__r", md5(col("vec_id").cast("string")))
      .orderBy(col("__r"), col("vec_id")).limit(ks)
      .collect().map(_.getSeq[Float](1).toArray)
    // sub-L2² against codebook entry (j, c), summed in dimension order
    def subD2(emb: Column, j: Int, c: Int): Column = {
      val lit = typedLit(sample(c).slice(j * sub, (j + 1) * sub).toSeq)
      aggregate(
        zip_with(slice(emb, j * sub + 1, sub), lit, (x, y) =>
          (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
        org.apache.spark.sql.functions.lit(0.0), (acc, v) => acc + v)
    }
    // corpus-side encode is the hot path (one row per corpus vector):
    // the native fused argmin loop ([[PqEncode]]) replaces m×ks
    // interpreted aggregate(zip_with(slice)) folds per row — same
    // dimension-order accumulation and first-index-on-ties argmin, so the
    // DuckDB oracle replay is bit-identical
    require(sample.length == ks, s"codebook sample ${sample.length} != ks=$ks")
    val codes = corpus.select(col("vec_id"),
      PqEncode.encode(col("embedding"), sample, m, ks, sub).as("codes"))
    val lut = broadcast(queries.select(col("vec_id").as("query_id"),
      array((0 until m).flatMap(j => (0 until ks).map(c =>
        subD2(col("embedding"), j, c))): _*).as("lut")))
    // ADC: est_d2 = Σ_j lut[j·ks + code_j], left fold in subspace order
    val est = (0 until m).map(j =>
        element_at(col("lut"), element_at(col("codes"), j + 1) + lit(j * ks) + 1))
      .reduce(_ + _)
    (codes, lut, est)
  }

  private def pqRank(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("est_d2").asc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"),
        round(col("est_d2"), 6).as("est_d2"))
  }

  /** Semantic deduplication (SemDeDup, Abbas et al. 2023 — public):
    * embedding-space near-dups are removed CLUSTER-LOCALLY — vectors are
    * assigned to their nearest coarse centroid (the same deterministic
    * quantizer as [[ivfTopK]]), and pairwise cosine runs only WITHIN each
    * cluster, so the all-pairs cost is Σ|cluster|² ≈ n·√n at √n balanced
    * centroids instead of n² — the property that makes embedding dedup
    * feasible at corpus scale. Drop rule (deterministic): doc b is a dup
    * iff some lower-id doc a in the same cluster has cos(a,b) ≥ τ. Returns
    * one row per DROPPED doc with its dominating neighbor stats; survivors
    * = corpus anti-joined on `vec_id`.
    */
  def semanticDedup(corpus: DataFrame, threshold: Double,
      centroids: Int = 0): DataFrame = {
    val cents = sampledCentroids(corpus, centroids)
    val lists = assignNearest(
      corpus.select(col("vec_id").as("id"), col("embedding").as("emb")), cents, 1)
    val l = lists.select(col("cid"), col("id").as("a"), col("emb").as("emb_a"))
    val r = lists.select(col("cid"), col("id").as("b"), col("emb").as("emb_b"))
    l.join(r, Seq("cid"))
      .filter(col("a") < col("b"))
      .withColumn("sim", cosine(col("emb_a"), col("emb_b")))
      .filter(col("sim") >= threshold)
      .groupBy(col("b").as("vec_id"))
      .agg(count(lit(1)).as("n_dominating"),
        min(col("a")).as("min_neighbor"),
        round(max(col("sim")), 6).as("max_sim"))
  }

  /** Symmetric int8 quantization of an embedding column — the standard
    * vector-store/prep step: per-vector scale = max|x|/127, q_i =
    * nearest-int(x_i/scale) ∈ [-127, 127]. The nearest-int is computed as
    * `floor(x/scale + 0.5)` (round-half-UP), NOT `round()`: floor, +, /
    * are single-rounding IEEE ops with identical bit-level semantics in
    * every engine, while round() is not (Spark routes doubles through a
    * decimal string, DuckDB/C round the binary value — half-boundary
    * behavior differs). Exact .5 quotients are measure-zero on real float
    * data, so the half-up-vs-half-away difference never changes a real
    * code, and the max element maps to exactly ±127 either way. Zero
    * vectors keep a null scale and an all-zero code array. Returns (input
    * columns + q_scale + q_codes).
    */
  def quantizeInt8(df: DataFrame, embCol: String = "embedding"): DataFrame = {
    val emb = col(embCol)
    val scale = array_max(transform(emb, x => abs(x))) / lit(127.0)
    df.withColumn("q_scale", when(scale > 0.0, scale))
      .withColumn("q_codes",
        when(col("q_scale").isNotNull,
          transform(emb, x =>
            floor(x.cast("double") / col("q_scale") + lit(0.5)).cast("int")))
          .otherwise(transform(emb, _ => lit(0))))
  }

  /** ANN via random-hyperplane LSH: candidates share a bucket with the
    * query; rerank by exact cosine, top-k per query. Recall < 1 by design —
    * probe multiple hash tables for higher recall (tables parameter).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 8, tables: Int = 2, dims: Int = 64): DataFrame = {
    def withBuckets(df: DataFrame, id: Column, emb: Column): DataFrame =
      df.select(id.as("id"), emb.as("emb"),
        explode(array((0 until tables).map(t =>
          // table t draws planes [t*nPlanes, (t+1)*nPlanes) — disjoint
          // families, so each extra table contributes independent recall
          concat_ws(":", lit(t), lshBucketAt(emb, t * nPlanes, nPlanes, dims))): _*))
          .as("bucket"))
    val c = withBuckets(corpus, col("vec_id"), col("embedding"))
    val q = broadcast(withBuckets(queries, col("vec_id"), col("embedding"))
      .withColumnRenamed("id", "query_id").withColumnRenamed("emb", "q_emb"))
    val cands = c.join(q, "bucket")
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("vec_id"), col("q_emb"), col("emb"))
      .distinct()
    val scored = cands.withColumn("sim", cosine(col("q_emb"), col("emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 6).as("sim"))
  }
}
