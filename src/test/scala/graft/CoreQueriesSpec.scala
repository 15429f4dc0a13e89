package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4).appName("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class CoreQueriesSpec extends AnyFunSuite {
  import TestSpark._

  test("all registered queries run and return rows on sf0.001") {
    // rows whose CORRECT answer is empty at sf0.001 by construction —
    // and whose DuckDB oracles are empty there too, so the compare stays
    // meaningful: it_seg_at_end pins the one hour right after the query
    // window and it_seg_at_pin_range needs a fully-covered 4h window at
    // its pin, neither of which the ~1000-event sf0.001 corpus reliably
    // populates. The driver's correctness gate runs at sf0.01, where
    // both emit full 840-row grids (and a regression to empty turns
    // them red by ROWCOUNT there). They must still RUN cleanly here.
    val emptyOkAtSf0001 = Set("it_seg_at_end", "it_seg_at_pin_range")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, sf).count()
        if (n > 0 || emptyOkAtSf0001(name)) None else Some(s"$name: 0 rows")
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has consistent oracle key") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql keys without queries: $extra")
  }

  test("curation funnel: stage counts are a monotone funnel that covers the corpus") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("pp_curation_funnel")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (raw, q, u, a) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(raw >= q && q >= u && u >= a && a >= 0,
        s"${r.getString(0)}: funnel not monotone raw=$raw q=$q u=$u adm=$a")
    }
    val totalRaw = out.map(_.getLong(1)).sum
    val corpus = graft.model.Tables.documents(spark, sf).count()
    assert(totalRaw == corpus, s"raw stage must cover the corpus: $totalRaw != $corpus")
    // something must actually flow through and something must be cut
    assert(out.map(_.getLong(4)).sum > 0, "nothing admitted")
    assert(out.map(_.getLong(4)).sum < totalRaw, "funnel cut nothing")
  }
}
