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
}

object Catalog {
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
