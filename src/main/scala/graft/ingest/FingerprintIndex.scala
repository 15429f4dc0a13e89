package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fingerprint skip-index — the Spark-native re-expression of the
  * reference's segment fingerprint index (fingerprints are computed per
  * row at ingest, internal/fingerprint/fingerprint.go:119-172; stored as a
  * per-segment `fingerprints bigint[]` inverted index,
  * lrdb/queries/log_seg.sql:102-119; and intersected against
  * needle/matcher fingerprints before any segment is read,
  * queryapi/logs_evaluator.go:233-424).
  *
  * Spark shape: a small parquet side table `(dateint, file, fingerprint)`
  * under `<segDir>/_fpindex` (underscore prefix → invisible to normal
  * parquet reads), one exploded row per distinct fingerprint per data
  * file. Three fingerprint families, mirroring the reference's
  * IndexExact/IndexTrigramExact flags:
  *
  *  - exists  — `fp(field, ".*")` for every column with ≥1 non-null value
  *    in the file (reference: every present row key gets an exists fp);
  *  - exact   — `fp(field, value)` for each distinct value of the fields
  *    in [[ExactFields]] (log_level, resource_service_name, …);
  *  - trigram — `fp(field, t)` for each distinct 3-char substring of the
  *    fields in [[TrigramFields]]. Unlike the reference (which trigram-
  *    indexes only resource dimensions), the BODY (`log_message`) is
  *    trigram-indexed too, so a needle query `{...} |= "deadbeef"` over 30
  *    days prunes to the files that can contain the needle instead of
  *    scanning every segment in range. Files whose body trigram set
  *    exceeds [[MaxTrigramsPerFile]] keep exists/exact entries but drop
  *    the trigram family — a per-field sentinel fingerprint records which
  *    files ARE fully trigram-indexed, and pruning only ever excludes a
  *    file positively known to lack a required fingerprint, so the index
  *    is lossless by construction (unindexed or capped files always scan).
  *
  * The hash is md5-48 over `field:token` (engine-neutral, consistent
  * between the distributed Column build and the driver-side query
  * computation) rather than the reference's Java-31 rolling hash — a
  * documented divergence; only internal consistency matters since the
  * index never changes results, only the file list.
  *
  * Scale: the build is explode → distinct-per-file → hash (md5 cost paid
  * per distinct trigram, not per row), one shuffle keyed by file; the
  * query side is one filtered aggregation over the index (predicate on
  * `fingerprint` pushes into the index's own bloom filter) returning a
  * per-file hit set bounded by the requirement count — the same "ask a
  * small index, then read the survivors" motion as the reference's
  * PostgreSQL segment lookup, with the candidate file list (not data)
  * landing on the driver exactly like the reference's query-API does.
  */
object FingerprintIndex {

  val ExistsToken = ".*"
  val BodyField = "log_message"

  /** default cap on distinct body trigrams indexed per file; above it the
    * file's trigram family is dropped (file always scans for needle
    * queries — correct, just not prunable)
    */
  val MaxTrigramsPerFile = 50000L

  /** exact-value-indexed fields (reference IndexedDimensions,
    * internal/fingerprint/fingerprint.go:60-70, adapted to cooked names)
    */
  val ExactFields: Set[String] = Set(
    "chq_telemetry_type", "log_level", "metric_name",
    "resource_customer_domain", "resource_file", "resource_k8s_cluster_name",
    "resource_k8s_namespace_name", "resource_service_name", "span_trace_id")

  /** trigram-indexed fields = the reference's IndexTrigramExact set + the
    * body (the "or a trigram-set column" variant)
    */
  val TrigramFields: Set[String] = Set(
    "chq_telemetry_type", "resource_customer_domain",
    "resource_k8s_cluster_name", "resource_k8s_namespace_name",
    "resource_service_name", "span_trace_id", BodyField)

  // ---- hashing (driver side; bit-identical to fpCol below) -----------------

  /** 48-bit md5 hash of a string — first 6 digest bytes as unsigned */
  def hash48(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.take(6).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
  }

  def fingerprint(field: String, token: String): Long = hash48(field + ":" + token)
  def existsFp(field: String): Long = fingerprint(field, ExistsToken)

  /** sentinel marking a file as FULLY indexed for a family: `__file` =
    * file present in the index at all; a field name = that field's trigram
    * set is complete (not cap-dropped)
    */
  def sentinelFp(name: String): Long = fingerprint("__indexed", name)

  /** distinct 3-char substrings (reference toTrigrams,
    * fingerprint.go:119-144; char-based rather than rune-based — BMP
    * equivalence, divergence documented)
    */
  def trigrams(s: String): Set[String] =
    if (s == null || s.length < 3) Set.empty else s.sliding(3).toSet

  // ---- Column twins ---------------------------------------------------------

  private def fpCol(field: String, token: Column): Column =
    conv(substring(md5(concat(lit(field + ":"), token)), 1, 12), 16, 10).cast("long")

  private def trigramsCol(v: Column): Column =
    when(v.isNotNull && length(v) >= 3,
      array_distinct(transform(sequence(lit(1), length(v) - 2), i => v.substr(i, lit(3)))))
      .otherwise(array().cast("array<string>"))

  /** name-literal column resolution (label names are user-controlled) */
  private def qcol(df: DataFrame, name: String): Column =
    df(s"`${name.replace("`", "``")}`")

  // ---- build ----------------------------------------------------------------

  /** SIBLING dir (like compaction's `.compact_tmp`), not a child: segment
    * readers never see it, file-count/compaction metrics never count it,
    * and no hidden-path (`_`-prefix) special cases apply
    */
  def indexPath(segDir: String): String =
    segDir.stripSuffix("/") + ".fpindex"

  /** Build (overwrite) the fingerprint index for a segment dir — logs or
    * metrics; the families index whichever of their fields the schema
    * carries (for metrics that is chiefly metric_name exact fps, the same
    * dimension the reference's metric segment lookup keys on,
    * queryapi/metrics_evaluator.go:424-500). Run after segment writes /
    * compaction, like the reference's ingest-side fingerprint
    * registration. One pass over the segments projecting only the
    * indexed columns.
    */
  def buildLogIndex(spark: SparkSession, segDir: String,
      maxTrigramsPerFile: Long = MaxTrigramsPerFile): Unit =
    indexRows(spark.read.option("mergeSchema", "true").parquet(segDir),
      maxTrigramsPerFile)
      // overwrite semantics: a full rebuild always describes the current
      // dir contents
      .write.mode("overwrite")
      .option("compression", "zstd")
      .option("parquet.bloom.filter.enabled#fingerprint", "true")
      .parquet(indexPath(segDir))

  /** Incremental indexing — the per-batch registration an ingest worker
    * does (the reference inserts one segment row per written file; a full
    * rebuild at 100 TB would re-read the lake). Indexes ONLY files not
    * yet in the index and APPENDS their rows. Returns the number of newly
    * indexed files. Stale rows for files removed by compaction are
    * harmless (exclusions are intersected against the live file list) but
    * compaction should still run [[buildLogIndex]] for a clean slate.
    */
  def indexNewFiles(spark: SparkSession, segDir: String,
      maxTrigramsPerFile: Long = MaxTrigramsPerFile): Long = {
    val idxP = new org.apache.hadoop.fs.Path(indexPath(segDir))
    val fs = idxP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val indexed: Set[String] =
      if (!fs.exists(idxP)) Set.empty
      else spark.read.parquet(indexPath(segDir)).select(col("file"))
        .distinct().collect().map(_.getString(0)).toSet
    val full = spark.read.option("mergeSchema", "true").parquet(segDir)
    val newFiles = full.inputFiles.map(normPath).filterNot(indexed).toSeq
    if (newFiles.isEmpty) return 0L
    val df = spark.read.option("mergeSchema", "true")
      .option("basePath", segDir).parquet(newFiles: _*)
    indexRows(df, maxTrigramsPerFile)
      .write.mode("append")
      .option("compression", "zstd")
      .option("parquet.bloom.filter.enabled#fingerprint", "true")
      .parquet(indexPath(segDir))
    newFiles.length.toLong
  }

  /** the (file, fingerprint) rows for one frame of segment data */
  private def indexRows(df: DataFrame, maxTrigramsPerFile: Long): DataFrame = {
    val partitionCols = Set("dateint", "freq")
    val fields = df.schema.fieldNames.filterNot(partitionCols).toSeq
    val withFile = df.withColumn("__file", normPathCol(input_file_name()))

    // exists family: one agg pass → per file, which fields are ever non-null
    val existsFlags = fields.zipWithIndex.map { case (f, i) =>
      max(qcol(df, f).isNotNull).as(s"__p$i")
    }
    val existsPairs = withFile.groupBy(col("__file"))
      .agg(existsFlags.head, existsFlags.tail: _*)
      .select(col("__file"), explode(array(fields.zipWithIndex.map { case (f, i) =>
        when(col(s"__p$i"), lit(existsFp(f)))
      }: _*)).as("fingerprint"))
      .filter(col("fingerprint").isNotNull)

    // per-file "indexed at all" marker rides the exists pass
    val fileMarkers = withFile.select(col("__file")).distinct()
      .select(col("__file"), lit(sentinelFp("__file")).as("fingerprint"))

    // exact family: distinct (file, value) then hash — md5 per distinct value
    val exactPairs = (ExactFields & fields.toSet).toSeq.sorted.map { f =>
      withFile.select(col("__file"), qcol(df, f).cast("string").as("__v"))
        .filter(col("__v").isNotNull && col("__v") =!= "")
        .distinct()
        .select(col("__file"), fpCol(f, col("__v")).as("fingerprint"))
    }

    // trigram family: explode → distinct (file, trigram) → hash; files over
    // the cap lose the family AND its completeness sentinel
    val trigramPairs = (TrigramFields & fields.toSet).toSeq.sorted.flatMap { f =>
      val tg = withFile
        .select(col("__file"), explode(trigramsCol(qcol(df, f).cast("string"))).as("__t"))
        .distinct()
      val counted = tg.groupBy(col("__file"))
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") <= maxTrigramsPerFile)
        .select(col("__file"))
      val kept = tg.join(counted, Seq("__file"))
        .select(col("__file"), fpCol(f, col("__t")).as("fingerprint"))
      val sentinels = counted
        .select(col("__file"), lit(sentinelFp(f)).as("fingerprint"))
      Seq(kept, sentinels)
    }

    // sorted by fingerprint so the point-lookup read gets row-group stats
    // + a bloom filter on the probe column
    (Seq(existsPairs, fileMarkers) ++ exactPairs ++ trigramPairs)
      .reduce(_ union _)
      .distinct()
      .withColumnRenamed("__file", "file")
      .sortWithinPartitions(col("fingerprint"))
  }

  // ---- query side -----------------------------------------------------------

  /** An AND-set of fingerprints a matching file MUST contain for `field`.
    * `guarded`: the family may be cap-dropped per file, so exclusion also
    * requires that file's completeness sentinel (trigram families).
    */
  final case class Requirement(field: String, fps: Seq[Long], guarded: Boolean)

  /** Conservative requirements from a LogQL pipeline — mirrors the
    * reference's exact > trigram > exists priority
    * (queryapi/logs_evaluator.go:244-306) with the subset that can never
    * over-prune: `=` matchers (non-empty value: empty means "label
    * absent", which an exists fp would wrongly prune) and `|=` contains
    * line filters BEFORE any line-rewriting stage (later filters see a
    * line_format-rewritten line the index never saw). Regex/negation
    * contribute nothing (the reference falls back to exists; we already
    * require exists via the matcher's field).
    */
  def requirementsFor(pipeline: graft.logql.LogPipeline): Seq[Requirement] = {
    import graft.logql._
    import graft.promql.MatchOp
    val fromMatchers = pipeline.matchers.flatMap { m =>
      m.op match {
        case MatchOp.Eq if m.value.nonEmpty && ExactFields.contains(m.label) =>
          Some(Requirement(m.label,
            Seq(existsFp(m.label), fingerprint(m.label, m.value)), guarded = false))
        case MatchOp.Eq if m.value.nonEmpty =>
          Some(Requirement(m.label, Seq(existsFp(m.label)), guarded = false))
        case _ => None
      }
    }
    val preRewrite = pipeline.stages.takeWhile {
      case _: LineFormatStage | DecolorizeStage => false
      case _ => true
    }
    val fromLineFilters = preRewrite.collect {
      case LineFilter(LineFilterOp.Contains, needle) if trigrams(needle).nonEmpty =>
        Requirement(BodyField,
          trigrams(needle).toSeq.sorted.map(t => fingerprint(BodyField, t)),
          guarded = true)
    }
    fromMatchers ++ fromLineFilters
  }

  /** Files under segDir that may be EXCLUDED from the scan: indexed files
    * positively known to lack a required fingerprint. One filtered agg
    * over the index; result size ≤ file count.
    */
  def excludedFiles(spark: SparkSession, segDir: String,
      reqs: Seq[Requirement]): Set[String] = {
    if (reqs.isEmpty) return Set.empty
    val idxP = new org.apache.hadoop.fs.Path(indexPath(segDir))
    val fs = idxP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(idxP)) return Set.empty
    val fileMarker = sentinelFp("__file")
    val wanted = (fileMarker +: reqs.flatMap(r =>
      (if (r.guarded) Seq(sentinelFp(r.field)) else Nil) ++ r.fps)).distinct
    // any index read failure degrades to "no pruning", which is always correct
    val idx = try spark.read.parquet(indexPath(segDir))
      catch { case _: org.apache.spark.sql.AnalysisException => return Set.empty }
    val hits = idx
      .filter(col("fingerprint").isin(wanted: _*))
      .groupBy(col("file"))
      .agg(collect_set(col("fingerprint")).as("fps"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSet)
    hits.collect { case (file, fps) if fps.contains(fileMarker) &&
        reqs.exists { r =>
          val familyComplete = !r.guarded || fps.contains(sentinelFp(r.field))
          familyComplete && !r.fps.forall(fps.contains)
        } => file
    }.toSet
  }

  /** Read the log segments minus an excluded-file set (lossless: callers
    * only pass files provably non-matching; unindexed files are never in
    * the set). Empty exclusions → plain full scan.
    */
  def prunedRead(spark: SparkSession, segDir: String,
      excluded: Set[String]): DataFrame = {
    val full = spark.read.option("mergeSchema", "true").parquet(segDir)
    if (excluded.isEmpty) return full
    val keep = full.inputFiles.map(normPath).filterNot(excluded).toSeq
    if (keep.isEmpty) full.where(lit(false))
    else spark.read.option("mergeSchema", "true").option("basePath", segDir)
      .parquet(keep: _*)
  }

  /** Read the log segments with index-pruned file list for one pipeline.
    * Falls back to the full scan when there is no index or no requirement.
    */
  def scanLogs(spark: SparkSession, segDir: String,
      pipeline: graft.logql.LogPipeline): DataFrame =
    prunedRead(spark, segDir,
      excludedFiles(spark, segDir, requirementsFor(pipeline)))

  /** `file:///a/b`, `file:/a/b`, `/a/b` → `/a/b` (input_file_name and
    * DataFrame.inputFiles render schemes differently)
    */
  def normPath(p: String): String =
    try {
      val u = new java.net.URI(p)
      if (u.getScheme != null && u.getPath != null) u.getPath else p
    } catch { case _: Exception => p }

  private def normPathCol(c: Column): Column =
    regexp_replace(c, "^[a-zA-Z0-9]+:/+", "/")
}
