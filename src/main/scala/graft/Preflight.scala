package graft

/** Fast environment preflight: load every driver-provided table, print its
  * schema and count, and exercise the `events` ts normalization. Run this
  * FIRST each session — a regenerated testdata directory with a new schema
  * flavor should be a one-line first-turn diagnosis, not 161 cryptic
  * analysis errors discovered at the end of a round (round 8 lost ~47
  * minutes to exactly that: events.ts changed parquet flavor and every
  * events-derived fixture failed at analysis time).
  *
  * Usage: tools/run.sh graft.Preflight /root/testdata/sf0.001
  * Exit 0 = all tables load; nonzero = first failure printed on stderr.
  */
object Preflight {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    var failed = false
    names.foreach { n =>
      try {
        val df =
          if (n == "events") graft.model.Tables.events(spark, sfDir)
          else graft.model.Tables.load(spark, sfDir, n)
        val cnt = df.count()
        val schema = df.schema.fields
          .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
        println(f"[preflight] OK   $n%-10s $cnt%9d rows  ($schema)")
      } catch {
        case e: Throwable =>
          failed = true
          System.err.println(s"[preflight] FAIL $n: ${e.getMessage}")
      }
    }
    spark.stop()
    if (failed) sys.exit(1)
  }
}
