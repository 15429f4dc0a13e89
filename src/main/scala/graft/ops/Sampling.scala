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
}
