package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tag discovery endpoints (reference /api/v1/{metrics,logs,spans}/tags and
  * tagvalues, queryapi/tag_values_evaluator.go; UNPIVOT SQL at
  * promql/sql_builder.go:471-527). In Spark the tag-name side is schema
  * introspection + non-null counts (no UNPIVOT needed); the tag-value side
  * is a distinct + count over the label column.
  */
object Discovery {

  /** distinct values of one tag with row counts, time-bounded */
  def tagValues(df: DataFrame, tag: String, startMs: Long, endMs: Long,
      limit: Int = 1000): DataFrame =
    df.filter(col("chq_timestamp") >= startMs && col("chq_timestamp") < endMs)
      .filter(col(tag).isNotNull && col(tag) =!= "")
      .groupBy(df(tag).as("tag_value"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tag_value").asc)
      .limit(limit)

  /** every label column with its non-null/non-empty row count — one
    * aggregation pass, then a stack to (tag, n) rows
    */
  def tagNames(df: DataFrame, labels: Seq[String], startMs: Long, endMs: Long): DataFrame = {
    val timed = df.filter(col("chq_timestamp") >= startMs && col("chq_timestamp") < endMs)
    val counts = timed.agg(
      count(lit(1)).as("__total"),
      labels.map(l => count(when(col(l).isNotNull && col(l).cast("string") =!= "", 1)).as(l)): _*)
    val stackExpr = labels.map(l => s"'$l', `$l`").mkString(", ")
    counts.selectExpr(s"stack(${labels.size}, $stackExpr) AS (tag, n)")
      .filter(col("n") > 0)
  }
}
