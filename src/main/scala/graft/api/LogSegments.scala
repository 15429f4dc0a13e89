package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.FingerprintIndex
import graft.logql._
import graft.promql.QueryParams

/** Segments-backed LogQL front door — the full reference query lifecycle
  * in one call (queryapi/logs_evaluator.go: segment lookup via the
  * fingerprint index, then per-segment evaluation): parse the LogQL
  * string, compute fingerprint requirements per leaf, prune the file
  * list through [[FingerprintIndex]], dateint-prune to the effective
  * time range (query window extended left by the largest range+offset
  * lookback), and evaluate the expression with the shared compiler.
  *
  * Pruning across binop expressions is per-leaf conservative: a file is
  * skipped only when EVERY leaf excludes it (a file needed by any leaf
  * must be read).
  */
object LogSegments {

  private def leafPipelines(e: LogExpr): Seq[LogPipeline] = e match {
    case LeafQuery(q) => q.raw.orElse(q.range.map(_.pipeline)).toSeq
    case LogBin(_, l, r) => leafPipelines(l) ++ leafPipelines(r)
    case _ => Nil
  }

  private def maxLookbackMs(e: LogExpr): Long = e match {
    case LeafQuery(q) => q.range.map(r => r.rangeMs + r.offsetMs).getOrElse(0L)
    case LogBin(_, l, r) => math.max(maxLookbackMs(l), maxLookbackMs(r))
    case _ => 0L
  }

  /** The pruned cooked-logs frame a LogQL expression will scan (exposed
    * for plan inspection/tests). All leaves share ONE index read — their
    * requirement trees are batched through
    * [[FingerprintIndex.excludedForTrees]], which intersects per-leaf
    * exclusions (a file needed by any leaf must be read).
    */
  def scanFor(spark: SparkSession, segDir: String, e: LogExpr,
      p: QueryParams, org: Option[String] = None): DataFrame = {
    val excluded = FingerprintIndex.excludedForTrees(spark, segDir,
      leafPipelines(e).map(FingerprintIndex.requirementTreeFor))
    val effStart = p.startMs - maxLookbackMs(e)
    val scan0 = FingerprintIndex.prunedRead(spark, segDir, excluded)
      .filter(col("dateint") >= StepPolicy.dateintOf(effStart) &&
        col("dateint") <= StepPolicy.dateintOf(p.endMs - 1))
    // tenant isolation: org leads the partition layout, so this equality
    // prunes every other tenant's directories before dateint pruning
    org.fold(scan0)(o => scan0.filter(col("org") === o).drop("org"))
      .drop("dateint") // partition key, not a log label
  }

  /** Full LogQL query over written log segments. */
  def query(spark: SparkSession, segDir: String, logql: String, p: QueryParams,
      limit: Int = 1000, desc: Boolean = true, fields: Seq[String] = Nil,
      org: Option[String] = None): DataFrame = {
    val e = Parser.parseFull(logql)
      .fold(err => throw new IllegalArgumentException(err), identity)
    Compiler.exprQuery(e, LogStore(scanFor(spark, segDir, e, p, org)), p,
      limit, desc, fields)
  }
}
