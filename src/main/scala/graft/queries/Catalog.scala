package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered query: the Spark implementation plus (optionally) an
  * equivalent ANSI-SQL oracle the driver runs in DuckDB over the same
  * parquet tables. Column names MUST match between the two — the driver
  * sorts columns by name before hashing values.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

trait Catalog {
  def all: Seq[Q]

  /** Strict-hash-stable display quantization for FLOAT-SUM-derived values:
    * floor(v·10⁶ + 1/π)/10⁶ on BOTH engines instead of round(v, 6).
    *
    * Why not round: engine-internal summation order perturbs a window
    * sum/average by ulps, and the data is decimal-quantized (cents), so
    * averages routinely sit EXACTLY on round-6's x.xxxxxx5 boundaries —
    * each engine's ulp-noisy value then rounds to a different side and the
    * driver's exact hash flips (observed at sf0.1: 77 cells across 7
    * queries, every one a boundary flip). The irrational offset puts every
    * grid boundary off every rational data point, so ulp noise can never
    * change the emitted cell; floor/+/× are single-rounding IEEE ops with
    * identical semantics in any engine (round() is not: Spark routes
    * doubles through a decimal string, DuckDB rounds the binary value).
    * Same construction as the stddev fold-input quantization in
    * graft.promql.Engine.
    */
  final def q6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    // NaN guard: floor(NaN)=NaN on both engines, but the /1e6 keeps type
    floor(c * lit(1e6) + lit(Catalog.QuantOffset)) / lit(1e6)
  }

  /** DuckDB twin of [[q6]] — splice around a SQL expression */
  final def q6Sql(expr: String): String =
    s"floor(($expr) * 1000000 + CAST(${Catalog.QuantOffset} AS DOUBLE)) / 1000000.0"
}

object Catalog {
  /** 1/π — the boundary-offset for [[Catalog.q6]]; written as one literal
    * so Scala and the SQL splice parse the identical double
    */
  final val QuantOffset = 0.31830988618367446

  /** All catalogs contributing to SparkEntry. Order irrelevant. */
  def catalogs: Seq[Catalog] = Seq(
    CoreQueries,
    TelemetryQueries,
    PromQLQueries,
    LogQLQueries,
    PipelineQueries,
    ItQueries
  )

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.flatMap(_.all).map(q => q.name -> q.fn).toMap

  lazy val oracleSql: Map[String, String] =
    catalogs.flatMap(_.all).flatMap(q => q.oracle.map(q.name -> _)).toMap
}
