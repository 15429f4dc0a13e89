package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.api.Discovery

/** Discovery endpoints: the tag-name unpivot must survive hostile label
  * names (OTel attribute names are user-controlled and may hold backticks,
  * quotes, or dots), which rules out any string-assembled SQL in the path.
  */
class DiscoverySpec extends AnyFunSuite {
  import TestSpark._

  test("tagNames counts non-empty labels and survives hostile column names") {
    import spark.implicits._
    val df = Seq(
      (1000L, "a", "x", ""),
      (2000L, "b", null, "v"),
      (3000L, "c", "y", "w"))
      .toDF("chq_timestamp", "attr_plain", "attr_a`b", "attr_q'c\"d")
    val out = Discovery.tagNames(df, Seq("attr_plain", "attr_a`b", "attr_q'c\"d"), 0L, 10000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("attr_plain" -> 3L, "attr_a`b" -> 2L, "attr_q'c\"d" -> 2L))
  }

  test("tagValues and series survive hostile column names") {
    import spark.implicits._
    val df = Seq(
      (1000L, "x", "A"),
      (2000L, "x", "B"),
      (3000L, "y", "A"))
      .toDF("chq_timestamp", "attr_a`b", "attr_q'c")
    val tv = Discovery.tagValues(df, "attr_a`b", 0L, 10000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tv == Map("x" -> 2L, "y" -> 1L))
    val se = Discovery.series(df, Seq("attr_a`b", "attr_q'c"), 0L, 10000L,
      matchers = List(graft.promql.Matcher("attr_q'c", graft.promql.MatchOp.Eq, "A")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(se == Set(("x", "A", 1L), ("y", "A", 1L)))
  }

  test("tagNames drops all-empty labels and applies the time bound") {
    import spark.implicits._
    val df = Seq((1000L, "a", ""), (99999L, "b", "late"))
      .toDF("chq_timestamp", "attr_keep", "attr_empty")
    val out = Discovery.tagNames(df, Seq("attr_keep", "attr_empty"), 0L, 10000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // attr_empty is non-empty only outside the window → filtered out
    assert(out == Map("attr_keep" -> 1L))
  }
}
