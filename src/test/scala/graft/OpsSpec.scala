package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, TextOps}

class TextOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("langId picks the language with most stopword hits") {
    val df = Seq(
      ("the cat and the dog is in a house", "en"),
      ("le chat est un animal et la maison", "fr"),
      ("der hund und die katze ist ein tier", "de"),
      ("el perro y la casa es un lugar", "es"),
      ("zzz qqq www", "und")).toDF("text", "expected")
    val out = df.select(TextOps.langId($"text").as("got"), $"expected").collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("quality score is in [0,1] and penalizes junk") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs to the hills",
      "!!!! ???? ;;;; ####").toDF("text")
    val out = df.select(TextOps.qualityScore($"text")).collect().map(_.getDouble(0))
    assert(out.forall(v => v >= 0.0 && v <= 1.0))
    assert(out(0) > out(1))
  }

  test("qualityLr: hand-computed logit, keep threshold, digit penalty") {
    val df = Seq((1L, "the the zebra 42"), (2L, "000 111 222 333"))
      .toDF("doc_id", "text")
    val out = TextOps.qualityLr(df, "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toMap
    // doc 1: ws=[the,the,zebra,42] -> f_len=ln 17, f_stop=2/4, f_mtl=13/4,
    // f_ttr=3/4, f_digit=2/16 (same left-associative sum as the engine)
    val want = -2.0 + 0.35 * math.log(17.0) + 3.0 * 0.5 + 0.15 * (13.0 / 4) +
      1.2 * 0.75 - 2.5 * 0.125
    assert(out(1L)._1 == 4L)
    assert(out(1L)._2 == math.rint(want * 1e6) / 1e6, out(1L).toString)
    assert(out(1L)._3 == 1)
    // all-digit doc: no stopwords, heavy digit penalty -> rejected
    assert(out(2L)._3 == 0, out(2L).toString)
  }

  test("bigramSurprisal: improbable word sequences outscore formulaic ones") {
    import spark.implicits._
    import graft.ops.TextOps
    // doc 1/2 repeat the same bigrams (high P, low surprisal); doc 3
    // strings together bigrams seen nowhere else
    val df = Seq(
      (1L, "the cat sat the cat sat the cat sat"),
      (2L, "the cat sat the cat sat"),
      (3L, "sat the zebra quantum cat")).toDF("doc_id", "text")
    val out = TextOps.bigramSurprisal(df, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(3L) > out(1L) && out(3L) > out(2L), out.toString)
    // hand-check one cell: doc with a single repeated bigram
    val one = Seq((1L, "a a a")).toDF("doc_id", "text")
    val got = TextOps.bigramSurprisal(one, "text").head()
    // c(a,a)=2, c1(a)=3, V=1 -> sv = -ln(3/4) for both positions
    assert(got.getLong(1) == 2 &&
      math.abs(got.getDouble(2) - -math.log(3.0 / 4.0)) < 1e-12)
  }

  test("dsirScore: target-distribution docs outscore raw-pool docs") {
    import spark.implicits._
    import graft.ops.Sampling
    // target bigrams ("the cat sat...") vs disjoint raw bigrams; a held-out
    // doc drawn from the target distribution must outscore a raw-like one
    val tgt = (1 to 6).map(i => (i.toLong, "the cat sat on the mat again", true))
    val raw = (7 to 12).map(i => (i.toLong, "wire spool metal crate heavy load", false))
    val probe = Seq((20L, "the cat sat on the mat", false),
      (21L, "metal crate heavy load wire", false))
    val df = (tgt ++ raw ++ probe).toDF("doc_id", "text", "is_t")
    val out = Sampling.dsirScore(df, "text", $"is_t")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(20L) > out(21L), s"target-like ${out(20L)} <= raw-like ${out(21L)}")
    assert(out(1L) > 0 && out(7L) < out(1L))
  }

  test("dsirScoreAgainst: literal-weight per-row scorer equals the " +
      "CANONICAL distributed-join chain (and dsirScore routes through it)") {
    import spark.implicits._
    import graft.ops.Sampling
    val docs = ((1 to 6).map(i => (i.toLong, "the cat sat on the mat row " + i, true)) ++
      (7 to 12).map(i => (i.toLong, "wire spool metal crate heavy load " + i, false)))
      .toDF("doc_id", "text", "is_t")
    // the independent reference: bucket stats -> weight join -> ordered fold
    val batch = Sampling.dsirScoreColumns(docs, "text", $"is_t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val w = Sampling.dsirWeights(docs, "text", $"is_t")
    val row = Sampling.dsirScoreAgainst(docs, "text", w)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // bit-exact: same weights, same position-ordered fold
    assert(row == batch, s"row=$row\nbatch=$batch")
    // the production dsirScore (weights + native scorer) matches too
    val prod = Sampling.dsirScore(docs, "text", $"is_t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(prod == batch, s"prod=$prod\nbatch=$batch")
  }

  test("c4Stats: line filter, sentence count, and the page keep flag") {
    import spark.implicits._
    val goodPage = (1 to 5).map(i => s"this is sentence number $i.").mkString("\n")
    val df = Seq(
      (1L, goodPage),                               // 5 kept lines, 5 sentences
      (2L, goodPage + "\nno terminal punct here"),  // junk line dropped
      (3L, goodPage + "\nsome Lorem Ipsum filler."),// lorem -> rejected
      (4L, goodPage.replace("number 5.", "number 5 {code}.")), // brace
      (5L, "one line only."),                       // 1 sentence < 5
      (6L, "ok.\nshort.\nx y z?")                   // <3 words lines dropped
    ).toDF("doc_id", "text")
    val out = TextOps.c4Stats(df, "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getInt(6)))).toMap
    assert(out(1L) == ((5L, 5L, 5L, 0, 0, 1)), out(1L).toString)
    assert(out(2L) == ((6L, 5L, 5L, 0, 0, 1)), out(2L).toString)
    assert(out(3L)._4 == 1 && out(3L)._6 == 0)
    assert(out(4L)._5 == 1 && out(4L)._6 == 0)
    assert(out(5L)._6 == 0)
    // "ok." and "short." have <3 words; "x y z?" kept -> 1 sentence
    assert(out(6L) == ((3L, 1L, 1L, 0, 0, 0)), out(6L).toString)
  }

  test("token counting") {
    val df = Seq("a b  c", "").toDF("text")
    val out = df.select(TextOps.tokenCount($"text")).collect().map(_.getLong(0))
    assert(out(0) == 3)
  }

  test("winnowing: docs sharing a long substring share a fingerprint") {
    // k=8, w=4 → any common substring of length ≥ w+k−1 = 11 guarantees a
    // shared fingerprint (the winnowing local-algorithm property)
    val common = "a distinctive shared passage of text"
    val df = Seq(
      (1L, s"first document preamble $common and its own tail"),
      (2L, s"totally different opening here $common closing words"),
      (3L, "nothing in common with the others at all zzz")).toDF("doc_id", "text")
    val fps = TextOps.winnow(df, k = 8, w = 4).cache()
    val byDoc = fps.collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty)
    // density: winnowing keeps ~2/(w+1) of gram positions; sets are small
    assert(byDoc(1L).size < 40 && byDoc(3L).size < 40)
    // identical text → identical fingerprint set regardless of position
    val shifted = Seq((4L, s"xx $common"), (5L, s"yyyyy $common")).toDF("doc_id", "text")
    val f2 = TextOps.winnow(shifted, k = 8, w = 4).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    assert((f2(4L) intersect f2(5L)).nonEmpty)
    fps.unpersist()
  }

  test("repetitionStats: duplicate lines and repeated n-grams measured exactly") {
    val doc =
      "repeated line here\nunique line one\nrepeated line here\nspam spam spam spam"
    val df = Seq((1L, doc)).toDF("doc_id", "text")
    val r = TextOps.repetitionStats(df).head()
    assert(r.getAs[Long]("n_lines") == 4)
    // 4 lines, 3 distinct → 1 - 3/4
    assert(math.abs(r.getAs[Double]("dup_line_frac") - 0.25) < 1e-12)
    // dup line "repeated line here" (18 ch) twice / total line chars 70
    assert(math.abs(r.getAs[Double]("dup_line_char_frac") - 36.0 / 70.0) < 1e-12)
    // "spam spam" occurs 3× (9 ch); normalized text is 73 chars
    assert(math.abs(r.getAs[Double]("top_bigram_frac") - 27.0 / 73.0) < 1e-12)
    // dup trigrams: "repeated line here" 2×(18 ch), "spam spam spam" 2×(14 ch)
    assert(math.abs(r.getAs[Double]("dup_trigram_frac") - 64.0 / 73.0) < 1e-12)
    // a clean doc scores zero everywhere
    val clean = TextOps.repetitionStats(
      Seq((2L, "all words completely distinct in this document")).toDF("doc_id", "text")).head()
    assert(clean.getAs[Double]("dup_line_frac") == 0.0 &&
      clean.getAs[Double]("top_bigram_frac") > 0.0 &&
      clean.getAs[Double]("dup_trigram_frac") == 0.0)
  }

  test("gopherQuality keeps prose and drops short/bullet-heavy docs") {
    val prose = (("the quick brown fox jumps over and rests with " * 8) +
      "one of that have be to and the with extra words here").trim
    val short = "tiny doc"
    val bullets = (1 to 10).map(i => s"- bullet item $i").mkString("\n") +
      "\nthe of and that have be to with " * 6
    val df = Seq((1L, prose), (2L, short), (3L, bullets)).toDF("doc_id", "text")
    val out = TextOps.gopherQuality(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(out(1L), "prose doc should pass")
    assert(!out(2L), "short doc must fail the 50-word floor")
    assert(!out(3L), "bullet-heavy doc must fail the 90% bullet cap")
  }

  test("scrubPii redacts emails, IPs, card numbers, phones; leaves prose alone") {
    val df = Seq(
      (1L, "mail alice.smith+x@sub.example.org now"),
      (2L, "server at 192.168.10.250 port open"),
      (3L, "card 4111111111111111 charged"),
      (4L, "call +14155550100 today"),
      (5L, "perfectly clean sentence with words")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextOps.scrubPii(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "mail <EMAIL> now")
    assert(out(2L) == "server at <IP> port open")
    assert(out(3L) == "card <NUMBER> charged")
    assert(out(4L) == "call <PHONE> today")
    assert(out(5L) == "perfectly clean sentence with words")
  }

  test("winnowPairs surfaces the substring-sharing pair only") {
    val common = "a distinctive shared passage of text appearing verbatim"
    val df = Seq(
      (1L, s"first document preamble $common and its own tail"),
      (2L, s"totally different opening here $common closing words"),
      (3L, "nothing in common with the others at all zzz qqq www")).toDF("doc_id", "text")
    val pairs = TextOps.winnowPairs(df, k = 8, w = 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"missing (1,2): $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"false pair with 3: $pairs")
  }

  test("containmentPairs: contained doc scores 1.0 on its side, asymmetric vs Jaccard") {
    val inner = "a distinctive quoted passage long enough to winnow cleanly and unmistakably"
    val df = Seq(
      (1L, s"big wrapper document opens with context then includes $inner and " +
        "continues with a great deal of additional unrelated prose afterwards " +
        "covering many other topics entirely of its own invention and more"),
      (2L, inner), // doc 2's normalized text is a contiguous substring of doc 1's
      (3L, "nothing in common with the others at all zzz qqq www yyy xxx")
    ).toDF("doc_id", "text")
    val rows = TextOps.containmentPairs(df, k = 8, w = 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(5), r.getDouble(6)))).toMap
    // interior winnow windows of a contiguous substring select the same
    // minima as the superstring's corresponding windows -> fp(2) ⊆ fp(1)
    val (ca, cb) = rows.getOrElse((1L, 2L), fail(s"missing (1,2): $rows"))
    assert(cb == 1.0, s"contained side should be fully covered: $cb")
    assert(ca < 0.8, s"wrapper side must stay partial: $ca")
    assert(!rows.keySet.exists(p => p._1 == 3L || p._2 == 3L), rows.toString)
  }

  test("containmentPairs equals set algebra over the fingerprint sets on random docs") {
    // independent recomputation of the cap/pair/ratio plumbing: collect
    // the winnowed fp sets, replay the non-boilerplate containment in
    // plain Scala, compare every emitted pair AND every omission
    val rnd = new scala.util.Random(42)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docs = (0 until 40).map { i =>
      val n = 12 + rnd.nextInt(30)
      (i.toLong, (0 until n).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val cap = 10
    val fps = TextOps.winnow(df, k = 8, w = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byFp = fps.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
      .filter(_._2.size <= cap).toMap
    val okf = byFp.toSeq.flatMap { case (fp, ds) => ds.map(d => (d, fp)) }
    val nfp = okf.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = (for {
      (_, ds) <- byFp.toSeq if ds.size >= 2
      a <- ds; b <- ds if a < b
    } yield (a, b)).groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 2)
      .map { case ((a, b), sh) =>
        (a, b) -> ((sh, nfp(a), nfp(b), sh.toDouble / nfp(a), sh.toDouble / nfp(b)))
      }
      .filter { case (_, (_, _, _, c1, c2)) => math.max(c1, c2) >= 0.3 }
    val got = TextOps.containmentPairs(df, k = 8, w = 4, minShared = 2,
        maxDocsPerFp = cap, minContain = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(got == want,
      s"got=${got.size} want=${want.size} extra=${(got.keySet diff want.keySet).take(3)} missing=${(want.keySet diff got.keySet).take(3)}")
    assert(want.nonEmpty, "fixture produced no pairs — not a real check")
  }
}

class DedupSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different words about spark clusters and shuffle partitions here"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (5L, "another unrelated document mentioning parquet files and columnar storage formats")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val out = Dedup.exact(corpus, "text", "doc_id").collect()
    assert(out.length == 4)
    val dup = out.find(_.getLong(1) == 2L)
    assert(dup.isDefined && dup.get.getLong(0) == 1L) // kept min doc_id
  }

  test("WordGramAnchors matches the Column-algebra gram construction") {
    import org.apache.spark.sql.functions._
    // texts exercising the split edge cases the fused pass must copy:
    // leading/trailing/multiple spaces, fewer-than-k words, empty string
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "  leading and   irregular spacing  keeps empty tokens here ok",
      "short doc", "", "exactly three words",
      "a b c d e f g h i j k l m n o p").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "__t")
    val k = 4
    val words = split(col("__t"), " +")
    val columnForm = when(size(words) >= k,
      transform(sequence(lit(1), size(words) - lit(k - 1)),
        i => struct((i - 1).cast("int").as("pos"),
          xxhash64(array_join(slice(words, i, lit(k)), " ")).as("g"))))
      .otherwise(array().cast("array<struct<pos:int,g:bigint>>"))
    val a = texts.select(col("doc_id"), explode(columnForm).as("o"))
      .select(col("doc_id"), col("o.pos"), col("o.g"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val b = texts.select(col("doc_id"),
        explode(graft.ops.WordGramAnchors.anchors(col("__t"), k)).as("o"))
      .select(col("doc_id"), col("o.pos"), col("o.g"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(a.nonEmpty && a == b, s"native anchors diverge:\n$a\n$b")
  }

  test("spreadOrderedPairs emits exactly the orderedPairs multiset") {
    // the salted (per-head-distributed) expansion must be pair-for-pair
    // the canonical single-task form — including duplicate pairs from
    // docs co-occurring in several buckets (the downstream counts depend
    // on the multiset, not the set)
    import org.apache.spark.sql.functions._
    val lists = Seq(
      Seq(1L, 2L, 3L, 4L),
      Seq(2L, 3L),
      Seq(5L),          // singleton: no pairs
      Seq(1L, 2L, 9L),
      Seq.empty[Long]   // empty: no pairs
    ).toDF("ds")
    val canonical = lists
      .select(explode(Dedup.orderedPairs(col("ds"))).as("p"))
      .select(col("p.a"), col("p.b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val spread = Dedup.spreadOrderedPairs(lists)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(spread == canonical, s"$spread != $canonical")
    assert(canonical.count(_ == (2L, 3L)) == 2, "multiset must keep dupes")
  }

  test("ngram jaccard finds the near-dup pair") {
    val pairs = Dedup.ngramJaccard(corpus, "text", w = 5, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(3L) })
  }

  test("minhash LSH surfaces exact and near dups") {
    val pairs = Dedup.minhashLsh(corpus, "text", k = 16, bands = 4, w = 5, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs.get((1L, 4L)).contains(1.0)) // identical → all minhashes equal
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.keys.exists { case (a, b) => Set(a, b).contains(3L) })
  }

  test("hot-bucket cap bounds band-join expansion in all three LSH paths") {
    // 12 identical docs: every band bucket holds all 12 members — the
    // boilerplate-heavy shape that makes an uncapped band join quadratic
    val boiler = "the same boilerplate footer text repeated on every page of the site"
    val hot = spark.range(1, 13).select($"id".as("doc_id"), lit(boiler).as("text"))
    val inc = spark.range(100, 103).select($"id".as("doc_id"), lit(boiler).as("text"))
    // cap below the bucket size -> the hot bucket is dropped entirely
    assert(Dedup.minhashLsh(hot, "text", 16, 4, 5, 0.5, maxDocsPerBucket = 8)
      .count() == 0)
    // cap above -> all 66 pairs surface (sim 1.0)
    assert(Dedup.minhashLsh(hot, "text", 16, 4, 5, 0.5, maxDocsPerBucket = 20)
      .count() == 66)
    assert(Dedup.incrementalDedup(hot, inc, "text", 16, 4, 5, 0.5,
      maxDocsPerBucket = 8).count() == 0)
    assert(Dedup.incrementalDedup(hot, inc, "text", 16, 4, 5, 0.5,
      maxDocsPerBucket = 20).count() == 3)
    // streaming screen: the cap rides the REFERENCE banding (the stream
    // side is per-row and stateless)
    import graft.streaming.StreamingDedup
    assert(StreamingDedup.nearDupAgainst(inc,
      StreamingDedup.bandedReference(hot, "text", maxDocsPerBucket = 8),
      "text").count() == 0)
    assert(StreamingDedup.nearDupAgainst(inc,
      StreamingDedup.bandedReference(hot, "text", maxDocsPerBucket = 20),
      "text").count() == 3L * 12 * 4) // one row per (new, ref, shared band)
  }

  test("lineDedup drops cross-corpus boilerplate lines, keeps order") {
    import spark.implicits._
    // 12 docs share a footer line; cap 10 -> dropped everywhere; unique
    // body lines survive in original order
    val docs = (1 to 12).map(i =>
      (i.toLong, s"body line $i one\nshared footer line\nbody line $i two"))
      .toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "text", maxDocsPerLine = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.size == 12 && out.values.forall(_ == ((3L, 2L))), out.toString)
    // under the cap nothing is dropped
    val out2 = Dedup.lineDedup(docs, "text", maxDocsPerLine = 12)
      .collect().map(r => r.getLong(2)).toSeq
    assert(out2.forall(_ == 3L))
    // a doc of pure boilerplate vanishes from the output entirely
    val withPure = docs.union(Seq((99L, "shared footer line"))
      .toDF("doc_id", "text"))
    val out3 = Dedup.lineDedup(withPure, "text", maxDocsPerLine = 10)
    assert(!out3.collect().map(_.getLong(0)).contains(99L))
  }

  test("image dHash: perceptual duplicates collide, distinct patterns differ") {
    import spark.implicits._
    import graft.ops.Multimodal
    val df = Seq(
      (1L, 16, 8, 73), (2L, 16, 10, 73), // same pattern, different HEIGHT
      (3L, 16, 8, 91),                   // different (wrapping) gradient
      (4L, 16, 8, 73)                    // exact dup of 1
    ).toDF("id", "w", "h", "sd")
    val out = df.select($"id", Multimodal.dHash64(
        Multimodal.encodePngColGrad($"w", $"h", $"sd")).as("ph"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the hash reads column structure only: height never changes it
    assert(out(1L) == out(4L) && out(1L) == out(2L), out.toString)
    assert(out(1L) != out(3L), out.toString)
    assert(out(1L).length == 16 && out(1L).matches("[0-9a-f]{16}"))
    // corruption -> null, not a throw
    val corrupt = Seq(Tuple1(Array[Byte](1, 2, 3))).toDF("b")
      .select(Multimodal.dHash64($"b")).head()
    assert(corrupt.isNullAt(0))
  }

  test("substrDup recovers the exact longest shared run; cap drops boilerplate") {
    import spark.implicits._
    val shared = "one two three four five six" // exactly-shared 6-word run
    val d = Seq(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"$shared delta epsilon zeta"),
      (3L, "totally unrelated words here nothing common")).toDF("doc_id", "text")
    val out = Dedup.substrDup(d, "text", k = 3, minWords = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 4 consecutive shared 3-grams on one diagonal -> run of 3 + 4 - 1 = 6
    assert(out.toSeq == Seq((1L, 2L, 6L, 4L)), out.mkString(","))
    // grams shared by more docs than the cap are boilerplate: dropped
    val boiler = (1 to 10).map(i => (i.toLong, s"same same same footer end$i"))
      .toDF("doc_id", "text")
    assert(Dedup.substrDup(boiler, "text", k = 3, minWords = 3,
      maxDocsPerGram = 5).count() == 0)
  }

  test("applyClusters keeps one canonical doc per cluster") {
    // corpus: 1≈2 (near), 1==4 (exact) cluster under min-id 1; 3 and 5 alone
    val clusters = Dedup.components(
      Dedup.minhashLsh(corpus, "text", k = 16, bands = 4, w = 5, threshold = 0.5))
    val survivors = Dedup.applyClusters(corpus, clusters)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 3L, 5L))
  }

  test("applyClustersKeepBest keeps the highest-score member, not the min id") {
    val clusters = Dedup.components(
      Dedup.minhashLsh(corpus, "text", k = 16, bands = 4, w = 5, threshold = 0.5))
    // score the cluster {1, 2, 4} so that 4 (NOT the min id) wins; ties
    // elsewhere are irrelevant (singletons never consult the score)
    val scored = corpus.select($"doc_id",
      when($"doc_id" === 4L, 9.0).otherwise($"doc_id".cast("double") * 0.1)
        .as("score"))
    val survivors = Dedup.applyClustersKeepBest(corpus, clusters, scored)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(4L, 3L, 5L), survivors.toString)
    // equal scores fall back to the lowest id — applyClusters' answer
    val flat = corpus.select($"doc_id", lit(1.0).as("score"))
    val tied = Dedup.applyClustersKeepBest(corpus, clusters, flat)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tied == Set(1L, 3L, 5L), tied.toString)
  }

  test("incremental dedup matches incoming docs against the existing corpus only") {
    val existing = corpus.filter($"doc_id" <= 3)
    val incoming = corpus.filter($"doc_id" >= 4)
    val out = Dedup.incrementalDedup(existing, incoming, "text",
      k = 16, bands = 4, w = 5, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    // 4 is an exact dup of existing 1 -> sim 1.0, representative 1
    assert(out.get(4L).exists { case (_, sim, m) => sim == 1.0 && m == 1L })
    // 5 is novel -> survives (absent from the match set)
    assert(!out.contains(5L))
    // output ids are incoming-side only: no existing x existing pairs leak
    assert(out.keySet.forall(_ >= 4L))
  }

  test("SignatureStore: stale store + fresh delta equals full recompute") {
    import graft.ops.SignatureStore
    // doc 6 is an exact dup of incoming 4/1 and arrives AFTER the store
    // was written — only the staleness rule (fresh scan above the
    // watermark) can match it
    val late = corpus.union(Seq(
      (6L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text"))
    val existing = late.filter($"doc_id" =!= 4L)
    val incoming = late.filter($"doc_id" === 4L)
    val dir = java.nio.file.Files.createTempDirectory("graft_sigstore_t_").toString
    // store covers only docs 1..3 -> watermark 3; 5 and 6 are the delta
    val meta = SignatureStore.write(existing.filter($"doc_id" <= 3), "text", dir)
    assert(meta.watermark == 3L)
    assert(SignatureStore.readMeta(dir) == meta)
    def shape(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    val persisted = shape(SignatureStore.incrementalDedup(
      existing, incoming, "text", dir))
    val recomputed = shape(Dedup.incrementalDedup(existing, incoming, "text"))
    assert(persisted == recomputed)
    assert(persisted.get(4L).exists { case (_, sim, m) => sim == 1.0 && m == 1L })
    // delta-only proof: with existing = {3, 5, 6} and a store covering
    // only doc 3, the ONLY possible match for incoming 4 is the
    // fresh-delta doc 6 — a store path that ignored the staleness rule
    // would return no match at all
    val existing2 = late.filter($"doc_id".isin(3L, 5L, 6L))
    val dir2 = java.nio.file.Files.createTempDirectory("graft_sigstore_t2_").toString
    SignatureStore.write(existing2.filter($"doc_id" <= 3), "text", dir2)
    val persisted2 = shape(SignatureStore.incrementalDedup(
      existing2, incoming, "text", dir2))
    assert(persisted2.get(4L).contains((1L, 1.0, 6L)))
  }

  test("global shuffle: contiguous 0..n-1 positions matching the windowed rank") {
    import graft.ops.Sampling
    val n = 1000
    // several uneven input partitions so the prefix-sum offsets do real work
    val df = spark.range(0, n).toDF("doc_id").repartition(7)
    val out = Sampling.globalShuffle(df, "doc_id", seed = 7)
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSeq.sorted == (0L until n).toSeq) // a permutation
    // the distributed construction must equal the single-window rank
    val want = df.select(col("doc_id"),
        (row_number().over(org.apache.spark.sql.expressions.Window.orderBy(
          md5(concat_ws("|", lit("7"), col("doc_id").cast("string"))),
          col("doc_id"))) - 1).cast("long").as("pos"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // deterministic across runs
    val again = Sampling.globalShuffle(df, "doc_id", seed = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("stopShingles surfaces planted boilerplate above organic text") {
    import spark.implicits._
    val banner = "accept all cookies to continue reading this site"
    val docs = (0 until 30).map { i =>
      // body tokens all carry the doc index, so no organic 5-gram ever
      // repeats across docs
      val body = (0 until 8).map(j => s"w${i}x$j").mkString(" ")
      (i.toLong, if (i % 2 == 0) s"$banner $body" else body)
    }.toDF("doc_id", "text")
    // the 8-word banner holds exactly 4 internal 5-grams, each in 15 docs;
    // organic 5-grams are doc-unique — the top-4 must be banner-only
    val top = Dedup.stopShingles(docs, "text", w = 5, topK = 4).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top.length == 4 &&
      top.forall { case (sh, df) => df == 15 && banner.contains(sh) },
      top.mkString("\n"))
  }

  test("packBoundaries: manifests reconstruct contiguous docs per sequence") {
    import spark.implicits._
    import graft.ops.Packing
    val df = (0 until 20).map(i => (i.toLong, "s", 30L + (i % 3) * 10))
      .toDF("doc_id", "st", "toks")
    val out = Packing.packBoundaries(df, "st", "doc_id", "toks", seqLen = 100L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    // parse every manifest back: offsets start where the previous doc in
    // the bin ended, and n_docs matches the entry count
    out.foreach { case (bin, nDocs, bounds) =>
      val entries = bounds.split('|').map { e =>
        val Array(id, off, n) = e.split(':'); (id.toLong, off.toLong, n.toLong)
      }
      assert(entries.length == nDocs, s"bin $bin")
      entries.sliding(2).foreach {
        case Array((_, o1, n1), (_, o2, _)) =>
          assert(o2 == o1 + n1, s"bin $bin gap: $bounds")
        case _ =>
      }
      assert(entries.head._2 < 100, s"bin $bin first offset out of range")
    }
    // every doc appears exactly once across all manifests
    val ids = out.flatMap(_._3.split('|').map(_.split(':')(0).toLong))
    assert(ids.sorted.toSeq == (0L until 20L).toSeq)
  }

  test("token-budget mixture: crossing doc kept, budgets honored per source") {
    import graft.ops.Sampling
    import spark.implicits._
    // source a: 10 docs x 10 tokens; source b: 10 docs x 100 tokens
    val df = ((0 until 10).map(i => (i.toLong, "a", 10L)) ++
      (0 until 10).map(i => (100L + i, "b", 100L)))
      .toDF("doc_id", "src", "n_tok")
    val out = Sampling.tokenBudgetMixture(df, "src", "doc_id", "n_tok",
        alpha = 0.5, targetTokens = 300L, seed = 1)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(3)))
    // alpha=0.5: T_a=100, T_b=1000 -> w = 10/(10+sqrt(1000)),
    // budgets ~ 72 and ~227 tokens
    val byS = out.groupBy(_._1)
    // source a: 72-token budget admits docs while run-n < 72 -> 8 docs
    // (7 full + the crossing one); source b: 227 -> 3 docs
    assert(byS("a").length == 8, byS("a").length.toString)
    assert(byS("b").length == 3, byS("b").length.toString)
    // budget column constant per source and matches the closed form
    assert(byS("a").map(_._3).toSet.size == 1 &&
      byS("b").map(_._3).toSet.size == 1)
    // determinism: same admission set across runs
    val again = Sampling.tokenBudgetMixture(df, "src", "doc_id", "n_tok",
        0.5, 300L, 1).collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(again == out.map(t => (t._1, t._2)).toSet)
  }

  test("curriculum order: bands ascend along pos, shuffled within band") {
    import graft.ops.Sampling
    val n = 900
    val df = spark.range(0, n).toDF("doc_id")
      .withColumn("band", (col("doc_id") % 3).cast("int")).repartition(5)
    val out = Sampling.curriculumOrder(df, "doc_id", "band", seed = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.map(_._3).sorted.toSeq == (0L until n).toSeq) // permutation
    // positions partition by band: all of band 0 precede all of band 1...
    val byPos = out.sortBy(_._3)
    assert(byPos.map(_._2).toSeq == byPos.map(_._2).toSeq.sorted)
    // within a band the order is the md5 shuffle, not id order
    val band0 = byPos.filter(_._2 == 0).map(_._1)
    assert(band0.toSeq != band0.toSeq.sorted, "band is in raw id order")
    // equals the single-window rank on the composite key
    val want = df.select(col("doc_id"),
        (row_number().over(org.apache.spark.sql.expressions.Window.orderBy(
          col("band"),
          md5(concat_ws("|", lit("3"), col("doc_id").cast("string"))),
          col("doc_id"))) - 1).cast("long").as("pos"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.map(t => t._1 -> t._3).toMap == want)
  }

  test("shard manifest partitions the shuffle order exactly, digests in pos order") {
    import graft.ops.{Packing, Sampling}
    val n = 500
    val df = spark.range(0, n).toDF("doc_id")
      .withColumn("text", concat(lit("doc "), col("doc_id"))).repartition(5)
    val man = Packing.shardManifest(df, "doc_id", "text", seed = 11, shardSize = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).sortBy(_._1)
    // shards tile [0, n) in order: contiguous pos ranges, full shards except
    // the last, total row count preserved
    assert(man.map(_._2).sum == n)
    man.init.foreach { case (_, rows, _, _, _, _) => assert(rows == 64) }
    man.foreach { case (sid, rows, lo, hi, _, _) =>
      assert(lo == sid * 64 && hi == lo + rows - 1)
    }
    // digest = md5 of ids comma-joined in pos order (recompute from the op)
    val pos = Sampling.globalShuffle(df, "doc_id", 11)
      .collect().map(r => r.getLong(2) -> r.getLong(0)).toMap
    val want0 = java.security.MessageDigest.getInstance("MD5")
      .digest((0L until 64L).map(pos).mkString(",").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(man.head._6 == want0)
  }

  test("alpha mixture flattens source skew, never upsamples, deterministic") {
    import spark.implicits._
    import graft.ops.Sampling
    // heavily skewed: 900 docs of 'big', 90 of 'mid', 10 of 'rare'
    val rows = (0 until 1000).map { i =>
      val src = if (i < 900) "big" else if (i < 990) "mid" else "rare"
      (i.toLong, src)
    }
    val df = rows.toDF("doc_id", "source")
    val out = Sampling.alphaMixture(df, "source", "doc_id", alpha = 0.5, targetN = 300L)
    val kept = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = out.select("source", "keep_rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // alpha=0.5 weights ~ sqrt(n): rare keeps a LARGER fraction than big
    // (rare's alpha-share exceeds its size -> clamped at 1.0, never above)
    assert(rates("rare") == 1.0 && rates("mid") > rates("big"), rates.toString)
    assert(rates("rare") > rates("mid"), rates.toString)
    // never upsample: every rate <= 1, kept <= source size
    assert(rates.values.forall(_ <= 1.0))
    assert(kept.getOrElse("big", 0L) <= 900 && kept.getOrElse("rare", 0L) <= 10)
    // deterministic: identical second run
    val again = Sampling.alphaMixture(df, "source", "doc_id", 0.5, 300L)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == kept)
  }

  test("stratified sampling is deterministic and rate-shaped") {
    import graft.ops.Sampling
    import spark.implicits._
    val df = (0 until 2000).map(i => (i.toLong, if (i % 4 == 0) "rare" else "common"))
      .toDF("doc_id", "cls")
    val rates = Map("rare" -> 1.0, "common" -> 0.5)
    def run() = Sampling.stratified(df, "cls", "doc_id", rates)
      .groupBy("cls").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = run()
    assert(a == run()) // bit-identical resample
    assert(a("rare") == 500L) // rate 1.0 keeps everything
    assert(math.abs(a("common") - 750.0) < 75, a.toString) // ~half of 1500
  }

  test("reliable-checkpoint mode (spark.graft.checkpointDir) matches local mode") {
    // same ops, blocks on a reliable FS instead of executor memory — the
    // fault-tolerance posture a 100 TB cluster with spot executors needs
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val localPairs = Dedup.minhashLsh(corpus, "text", k = 16, bands = 4, w = 5, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val localComps = Dedup.components(Seq((1L, 2L), (2L, 3L)).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set("spark.graft.checkpointDir", dir)
    try {
      val reliablePairs = Dedup.minhashLsh(corpus, "text", k = 16, bands = 4, w = 5, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val reliableComps = Dedup.components(Seq((1L, 2L), (2L, 3L)).toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliablePairs == localPairs && reliableComps == localComps)
      // the checkpoint actually landed on the reliable dir
      assert(new java.io.File(dir).listFiles().nonEmpty)
    } finally spark.conf.unset("spark.graft.checkpointDir")
  }

  test("simhash: identical texts equal, near-dups close, distinct far") {
    val sig = Dedup.simhash(corpus, "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(4L))
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(dist(sig(1L), sig(2L)) < dist(sig(1L), sig(3L)))
  }

  test("banded simhash pairs = brute-force pairs (pigeonhole completeness)") {
    val docs = graft.model.Tables.documents(spark, sf)
    val banded = Dedup.simhashPairs(docs, "text", bits = 32, maxDist = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over the collected signatures (small at test scale)
    val sigs = Dedup.simhash(docs, "text", bits = 32).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, ha) <- sigs; (b, hb) <- sigs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(banded == brute && banded.nonEmpty)
  }
}

class SimilaritySpec extends AnyFunSuite {
  import TestSpark._

  test("brute-force cosine: self-similar vectors rank first") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val out = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 5)
    val n = out.count()
    assert(n == 3 * 5)
    // sims within [-1, 1]
    assert(out.filter(col("sim") > 1.000001 || col("sim") < -1.000001).count() == 0)
  }

  test("LSH ANN recall against brute force is reasonable") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.lshTopK(emb, queries, k = 5, nPlanes = 4, tables = 2)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall=$recall") // random hyperplanes on random data
  }

  test("JL two-stage ANN recall against brute force") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(shortlist: Int): Double = {
      val ann = Similarity.jlTopK(emb, queries, k = 5, shortlist = shortlist)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & ann).size.toDouble / exact.size
    }
    // random 64-d vectors are near-orthogonal (top-5 sim gaps are tiny),
    // the adversarial case for any projection — recall still beats the
    // LSH band and MONOTONICALLY improves with the shortlist, the knob
    // the operator exposes
    val r20 = recallAt(20)
    val r80 = recallAt(80)
    assert(r20 >= 0.3, s"recall@20=$r20")
    assert(r80 >= r20 && r80 >= 0.45, s"recall@80=$r80 (recall@20=$r20)")
  }

  test("components: transitive closure with canonical min-id labels") {
    import spark.implicits._
    // chain 1-2-3 plus isolated pair 10-11; 3 never touches 1 directly
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 10L)).toDF("a", "b")
    val comp = Dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("components: a 64-deep chain converges in O(log diameter) rounds") {
    import spark.implicits._
    // worst case for plain min-propagation (63 rounds); pointer jumping
    // must land every node on label 0 within the log bound: the label
    // stride follows s ← 2s+1, so stride ≥ 63 by round 6, plus one
    // confirming round — well under the default maxIter=20
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Dedup.componentsWithRounds(chain)
    val comp = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 64 && comp.values.forall(_ == 0L), comp.toString)
    assert(rounds <= 9, s"chain took $rounds rounds — pointer jump broken?")
  }

  test("native DotProduct matches the HOF formulation bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5, -1.0, 2.0)),
      (Array(0.1f, 0.2f, 0.3f), Array(1.5, 2.5, -3.5))
    ).toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    val rows = df.select(Similarity.dot(col("a"), col("b")).as("native"),
      hof.as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
    // unequal lengths and null elements → null, like zip_with padding
    val edge = Seq(
      (Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Double](1.0, 2.0, 3.0)),
      (Array[java.lang.Float](1.0f, null), Array[java.lang.Double](1.0, 2.0))
    ).toDF("a", "b")
    val out = edge.select(Similarity.dot(col("a"), col("b"))).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("IVF ANN recall against brute force is reasonable") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.ivfTopK(emb, queries, k = 5, nProbe = 4)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    // probing 4 of ~32 lists; near-uniform random vectors are IVF's worst
    // case, so the bar is a sanity floor, not a quality target
    assert(recall >= 0.2, s"recall=$recall")

    // Lloyd-refined quantizer over a WIDER query set (recall on 25 pairs
    // is ±3-pair noise): same probe budget, same sanity floor. On
    // near-uniform vectors k-means clusters are weak structure, so the
    // gate is the floor plus shape (k rows per query), not superiority.
    val wq = emb.filter(col("vec_id") < 20)
    val wExact = Similarity.bruteForceTopK(emb, wq, k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lloyd = Similarity.ivfTopKLloyd(emb, wq, k = 5, nProbe = 4, iters = 2)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lloydRecall = (wExact & lloyd).size.toDouble / wExact.size
    assert(lloydRecall >= 0.2, s"lloyd=$lloydRecall")
    assert(lloyd.groupBy(_._1).forall(_._2.size == 5), "k rows per query")
  }

  test("PQ ANN: codes compress to m small ints, recall against brute force") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.pqTopK(emb, queries, k = 5, m = 8, ks = 16, dims = 64)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a 16-entry sampled codebook over near-uniform random vectors is PQ's
    // worst case (like the IVF test's floor): sanity bar + shape only
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.1, s"recall=$recall")
    assert(pq.groupBy(_._1).forall(_._2.size == 5), "k rows per query")
    // est_d2 is a true distance estimate: self-distance of an encoded
    // vector against its own codes is the quantization residual — finite,
    // non-negative, and strictly below the distance to a far vector on avg
    val est = Similarity.pqTopK(emb, queries, k = 5, m = 8, ks = 16, dims = 64)
      .select("est_d2").collect().map(_.getDouble(0))
    assert(est.forall(d => d >= 0.0 && java.lang.Double.isFinite(d)))

    // IVF-PQ returns a SUBSET of PQ's ranking universe (candidates pruned
    // to probed lists), scored with the identical ADC estimate: every
    // (query, vec, est_d2) it emits must appear in the full-scan PQ scores
    val full = Similarity.pqTopK(emb, queries, k = Int.MaxValue,
        m = 8, ks = 16, dims = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivfpq = Similarity.ivfPqTopK(emb, queries, k = 5, nProbe = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(ivfpq.nonEmpty)
    ivfpq.foreach { case (key, d) =>
      assert(full.get(key).contains(d), s"$key: $d not in full PQ scan")
    }
    assert(ivfpq.groupBy(_._1._1).forall(_._2.size <= 5))
  }

  test("BPE apply: rank-ordered merges, chained ranks, adjacency only") {
    import spark.implicits._
    import graft.ops.TextOps
    val merges = Seq("a" -> "n", "j" -> "o", "jo" -> "i", "joi" -> "n")
    val df = Seq((1L, "join"), (2L, "scan"), (3L, "nan"), (4L, "xy")).toDF("id", "w")
    val toks = df.select(col("id"), TextOps.bpeTokens(col("w"), merges).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    // chained ranks: j,o -> jo ; jo,i -> joi ; joi,n -> join (one token)
    assert(toks(1L) == List("join"), toks(1L).toString)
    // single merge mid-word
    assert(toks(2L) == List("s", "c", "an"))
    // left-to-right: n,a,n -> n + an (the leading n never pairs)
    assert(toks(3L) == List("n", "an"))
    // no applicable merges -> chars
    assert(toks(4L) == List("x", "y"))

    val sum = TextOps.bpeApply(Seq((9L, "join scan")).toDF("doc_id", "text"),
      "text", merges).collect().head
    assert(sum.getLong(1) == 2 && sum.getLong(2) == 8 && sum.getLong(3) == 4)
  }

  test("BPE train: frequency argmax, re-tokenize between rounds, early stop") {
    import spark.implicits._
    import graft.ops.TextOps
    val df = Seq((1L, "aa ab aa")).toDF("doc_id", "text")
    // round 1: pairs (a,a)x2, (a,b)x1 -> learn (a,a); round 2 re-tokenizes
    // to [aa],[a,b],[aa] so only (a,b) remains; round 3 has no pairs at all
    // -> trainer stops early despite numMerges = 3
    val learned = TextOps.bpeTrain(df, "text", numMerges = 3)
    assert(learned == Seq(("a", "a", 2L), ("a", "b", 1L)), learned.toString)
  }

  test("BPE trainLarge: identical table to bpeTrain, early stop, deep runs") {
    import spark.implicits._
    import graft.ops.TextOps
    // the materialized-state trainer must learn the IDENTICAL table the
    // re-deriving trainer learns (same counts, same tie-break), including
    // the early-stop case
    val df = Seq((1L, "aa ab aa")).toDF("doc_id", "text")
    assert(TextOps.bpeTrainLarge(df, "text", numMerges = 3) ==
      TextOps.bpeTrain(df, "text", numMerges = 3))
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the jay pig fox zebra and my wolves quack"),
      (4L, "the quick onyx goblin jumps over the lazy dwarf")).toDF("doc_id", "text")
    val small = TextOps.bpeTrain(corpus, "text", numMerges = 8)
    val large = TextOps.bpeTrainLarge(corpus, "text", numMerges = 8,
      checkpointEvery = 3) // exercise a mid-run state checkpoint
    assert(large == small, s"large=$large\nsmall=$small")
    // a deep run crosses several checkpoints and keeps making progress
    val deep = TextOps.bpeTrainLarge(corpus, "text", numMerges = 40,
      checkpointEvery = 4)
    assert(deep.take(8) == small && deep.length > 20, s"len=${deep.length}")
  }

  test("BPE trainFast: identical table to the distributed trainers") {
    import spark.implicits._
    import graft.ops.TextOps
    // the histogram + driver-greedy trainer must learn the IDENTICAL
    // table (counts, tie-breaks, early stop) the distributed trainers
    // learn — it replaces them in the catalog rows
    val df = Seq((1L, "aa ab aa")).toDF("doc_id", "text")
    assert(TextOps.bpeTrainFast(df, "text", numMerges = 3) ==
      TextOps.bpeTrain(df, "text", numMerges = 3))
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the jay pig fox zebra and my wolves quack"),
      (4L, "the quick onyx goblin jumps over the lazy dwarf")).toDF("doc_id", "text")
    assert(TextOps.bpeTrainFast(corpus, "text", numMerges = 8) ==
      TextOps.bpeTrain(corpus, "text", numMerges = 8))
    // deep run: 40 merges, vs the carried-state trainer across checkpoints
    assert(TextOps.bpeTrainFast(corpus, "text", numMerges = 40) ==
      TextOps.bpeTrainLarge(corpus, "text", numMerges = 40, checkpointEvery = 4))
    // repeated-token runs stress the non-overlap scan + incremental deltas
    val runs = Seq((1L, "aaaa aaa baba abab"), (2L, "abababab aab"))
      .toDF("doc_id", "text")
    assert(TextOps.bpeTrainFast(runs, "text", numMerges = 10) ==
      TextOps.bpeTrainLarge(runs, "text", numMerges = 10, checkpointEvery = 3))
  }

  test("BPE trainFast minCount floor: no-op below the word-frequency floor, cuts tail noise") {
    import spark.implicits._
    import graft.ops.TextOps
    // every distinct word appears >= 2 times (the corpus is doubled), so
    // a floor of 2 drops nothing and the learned table is bit-identical
    val sents = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "the jay pig fox zebra and my wolves quack")
    val doubled = (sents ++ sents).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val unfloored = TextOps.bpeTrainFast(doubled, "text", numMerges = 20)
    assert(TextOps.bpeTrainFast(doubled, "text", numMerges = 20, minCount = 2L)
      == unfloored)
    // heavy-tail corpus: the same doubled text plus 2000 UNIQUE hex-id
    // noise words (each frequency 1 — the web-scale token tail). With
    // the floor at 2 the noise is cut inside the distributed aggregate,
    // so the learned table equals training on the clean corpus alone —
    // and the driver histogram is vocabulary-, not tail-, sized
    val noise = (0 until 2000).map { i =>
      (10000L + i, f"0x${java.lang.Integer.toHexString(i * 2654435761L.toInt)}%s")
    }.toDF("doc_id", "text")
    val noisy = doubled.unionByName(noise)
    assert(TextOps.bpeTrainFast(noisy, "text", numMerges = 20, minCount = 2L)
      == unfloored)
    // without the floor the noise DOES reach the merge statistics (hex
    // pairs accumulate across the tail) — the floor is load-bearing
    assert(TextOps.bpeTrainFast(noisy, "text", numMerges = 20) != unfloored)
  }

  test("surprisal: hand-checked unigram LM means, token counts") {
    import spark.implicits._
    import graft.ops.TextOps
    // counts: a=2, b=2, total=4 → every token has p=1/2, surprisal=ln 2
    val df = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val out = TextOps.surprisal(df, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val ln2 = math.rint(math.log(2.0) * 1e6) / 1e6
    assert(out(1L) == ((3L, ln2)) && out(2L) == ((1L, ln2)), out.toString)
    // a rare token raises the doc's mean above a common-token doc's
    val df2 = Seq((1L, "x x x x"), (2L, "x rare")).toDF("doc_id", "text")
    val o2 = TextOps.surprisal(df2, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(o2(2L) > o2(1L))
  }

  test("vocab: counts, dense contiguous ranks, monotone coverage, binding cut") {
    import spark.implicits._
    import graft.ops.TextOps
    val df = Seq(
      (1L, "a a a b b c"), (2L, "a b d"), (3L, "e e e e")
    ).toDF("doc_id", "text")
    val out = TextOps.vocab(df, "text", topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._3)
    // counts: a=4, e=4, b=3, (c=1, d=1 cut); tie a/e broken by word asc
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq(("a", 4L, 1L), ("e", 4L, 2L), ("b", 3L, 3L)))
    // coverage over total=13 tokens, cumulative in rank order
    assert(out.map(_._4).toSeq == Seq(
      math.rint(4.0 / 13 * 1e6) / 1e6,
      math.rint(8.0 / 13 * 1e6) / 1e6,
      math.rint(11.0 / 13 * 1e6) / 1e6))
  }

  test("semantic dedup drops a planted exact twin; survivors keep lower ids") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    // plant an exact duplicate of vector 3 under a fresh high id: identical
    // vectors share a nearest centroid, so the clone MUST be caught by the
    // cluster-local pass
    val dup = emb.filter(col("vec_id") === 3).withColumn("vec_id", lit(999999L))
    val out = Similarity.semanticDedup(emb.unionByName(dup), threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(out.exists(t => t._1 == 999999L && t._2 == 3L && t._3 == 1.0),
      out.mkString(","))
    // the drop rule is lower-id-dominates: a dropped doc's neighbor id is
    // always strictly below its own
    assert(out.forall(t => t._2 < t._1))
  }

  test("randomProject: NULL embeddings pass through as NULL proj; wrong width raises") {
    import spark.implicits._
    val mixed = Seq((1L, Some((0 until 64).map(_.toFloat))), (2L, None))
      .toDF("vec_id", "embedding")
    // a missing embedding is data, not a schema error (ADVICE r12: the
    // width guard used to raise a null-message error on NULL rows)
    val out = Similarity.randomProject(mixed, outDims = 4)
      .select(col("vec_id"), col("proj")).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1L -> false, 2L -> true))
    // a present-but-wrong-width embedding still fails loudly
    val bad = Seq((3L, (0 until 8).map(_.toFloat))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.randomProject(bad, outDims = 4).collect()
    }
    assert(String.valueOf(e.getMessage).contains("!= dims") ||
      Option(e.getCause).exists(c => String.valueOf(c.getMessage).contains("!= dims")))
  }

  test("JL projection: norms concentrate around 1 on real embeddings") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val p = Similarity.randomProject(emb, outDims = 16)
    val ratios = p.select((Similarity.dot(col("proj"), col("proj")) /
        Similarity.dot(col("embedding"), col("embedding"))).as("r"))
      .collect().map(_.getDouble(0))
    // E[ratio] = 1 exactly; per-vector relative std ≈ sqrt(2/16) ≈ 0.35,
    // so the corpus mean is tight and individuals stay in a loose band.
    // Distances inherit the property by linearity (a difference vector
    // is itself projected by the same matrix).
    val mean = ratios.sum / ratios.length
    assert(math.abs(mean - 1.0) < 0.1, s"mean ratio $mean")
    assert(ratios.count(r => r > 0.2 && r < 3.0) >= ratios.length * 0.95,
      s"heavy tails: ${ratios.count(r => r <= 0.2 || r >= 3.0)} outliers")
    // determinism: the same matrix projects the same vector identically
    // across separate plans
    val again = Similarity.randomProject(emb, outDims = 16)
      .select(col("vec_id"), col("proj")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val first = p.select(col("vec_id"), col("proj")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(again == first)
  }

  test("knnLabelEval: planted tight clusters score 100%, scrambled labels do not") {
    import spark.implicits._
    // two well-separated clusters: e1-axis vs e2-axis with small jitter on
    // a third axis -> every point's nearest neighbor shares its label
    def v(axis: Int, j: Double): Seq[Float] =
      (0 until 8).map(i => (if (i == axis) 1.0 else if (i == 7) j else 0.0).toFloat)
    val rows = (0 until 6).map(i => (i.toLong, v(0, 0.01 * i), 0)) ++
      (6 until 12).map(i => (i.toLong, v(1, 0.01 * i), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = Similarity.knnLabelEval(emb).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0) == ((6L, 6L, 1.0)) && out(1) == ((6L, 6L, 1.0)), out.toString)
    // alternate labels across the SAME geometry: neighbors now disagree
    val bad = rows.map { case (id, e, _) => (id, e, (id % 2).toInt) }
      .toDF("vec_id", "embedding", "label")
    val acc2 = Similarity.knnLabelEval(bad).collect()
      .map(r => r.getDouble(3))
    assert(acc2.forall(_ < 1.0), acc2.mkString(","))
    // totals partition the set
    assert(Similarity.knnLabelEval(emb).agg(sum(col("n"))).head().getLong(0) == 12L)
  }

  test("sampled and ANN-shortlist 1-NN evals agree with the exact eval") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val n = emb.count().toInt
    def accs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // m >= corpus: the sampled eval degenerates to the exact leave-one-out
    val exact = accs(Similarity.knnLabelEval(emb))
    assert(accs(Similarity.knnLabelEvalSampled(emb, m = n)) == exact)
    // full probe: the IVF shortlist provably contains the true 1-NN, so
    // the ANN eval equals the sampled-exact answer at the same m
    val sampled = accs(Similarity.knnLabelEvalSampled(emb, m = 64))
    val ann = accs(Similarity.knnLabelEvalAnn(emb, m = 64, shortK = 8,
      centroids = 16, nProbe = 16))
    assert(ann == sampled, s"ann=$ann sampled=$sampled")
    // recall-limited probe: still a partition of the m sampled queries
    val low = Similarity.knnLabelEvalAnn(emb, m = 64, shortK = 8,
      centroids = 16, nProbe = 2)
    assert(low.agg(sum(col("n"))).head().getLong(0) == 64L)
  }

  test("persisted IVF index serves the identical top-k as the in-memory path") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 5)
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_spec_").toString
    Similarity.buildIvfIndex(emb, dir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fromIdx = rows(Similarity.ivfTopKFromIndex(spark, dir, q, k = 10, nProbe = 4))
    val inMem = rows(Similarity.ivfTopK(emb, q, k = 10, nProbe = 4))
    assert(fromIdx == inMem,
      s"idx=${fromIdx.size} mem=${inMem.size} diff=${(fromIdx diff inMem).take(3)}")
    assert(fromIdx.nonEmpty)
    // a second build into the same dir is idempotent (overwrite semantics)
    Similarity.buildIvfIndex(emb, dir)
    assert(rows(Similarity.ivfTopKFromIndex(spark, dir, q, k = 10, nProbe = 4)) == inMem)
  }

  test("IVF list compaction: append-decayed files collapse; answers bit-identical") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_cmp_").toString
    // build over a third, then three appends -> each touched cid
    // partition accumulates one small file per append batch
    Similarity.buildIvfIndex(emb.filter(col("vec_id") % 4 === 0), dir)
    (1 to 3).foreach(r => Similarity.appendToIvfIndex(
      emb.filter(col("vec_id") % 4 === r), dir))
    def parquetFiles(): Int = {
      val base = java.nio.file.Paths.get(
        Similarity.ivfDataRoot(spark, dir), "lists")
      val st = java.nio.file.Files.walk(base)
      try st.filter(p => p.toString.endsWith(".parquet")).count().toInt
      finally st.close()
    }
    val q = emb.filter(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val before = rows(Similarity.ivfTopKFromIndex(spark, dir, q, k = 10, nProbe = 4))
    val stBefore = Similarity.ivfIndexStats(spark, dir)
    val filesBefore = parquetFiles()
    Similarity.compactIvfIndex(spark, dir)
    val filesAfter = parquetFiles()
    // one shuffled file per cid partition replaces the per-append shards
    assert(filesAfter < filesBefore,
      s"compaction did not shrink the layout: $filesBefore -> $filesAfter")
    assert(filesAfter <= stBefore.centroids,
      s"$filesAfter files for ${stBefore.centroids} lists")
    // content and statistics unchanged — only the layout moved
    val stAfter = Similarity.ivfIndexStats(spark, dir)
    assert(stAfter.total == stBefore.total && stAfter.maxList == stBefore.maxList)
    assert(rows(Similarity.ivfTopKFromIndex(spark, dir, q, k = 10, nProbe = 4))
      == before)
  }

  test("IVF drift: skewed appends trip the skew stat; re-cluster restores balance and recall") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_drift_").toString
    Similarity.buildIvfIndex(emb, dir)
    val st0 = Similarity.ivfIndexStats(spark, dir)
    assert(st0.total == emb.count() && st0.skew >= 1.0)
    // adversarial delta: 600 vectors in a tight cloud around ONE corpus
    // point (hash noise +-0.1 per dim) — under the stored quantizer they
    // all land in that point's list
    val base = emb.orderBy(col("vec_id")).head().getSeq[Float](1)
    val delta = spark.range(0, 600)
      .select((col("id") + 100000L).as("vec_id"),
        transform(sequence(lit(0), lit(63)), d =>
          (element_at(lit(base.toArray), d + 1) +
            (pmod(hash(col("id"), d), lit(2000)) - lit(1000)) / 10000.0)
            .cast("float")).as("embedding"))
    Similarity.appendToIvfIndex(delta, dir)
    val st1 = Similarity.ivfIndexStats(spark, dir)
    assert(st1.total == st0.total + 600)
    assert(st1.skew > 8.0, s"adversarial append should skew the index: $st1")
    // meta carries the statistic (the drift rule's trigger input)
    val meta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "meta.json")), "UTF-8")
    assert(meta.contains("\"skew\":") && meta.contains("\"max_list\":"))
    // threshold-triggered re-cluster: fresh centroids from the grown
    // corpus split the dense region; no rows lost, balance restored
    assert(Similarity.maintainIvfIndex(spark, dir, maxSkew = 8.0))
    val st2 = Similarity.ivfIndexStats(spark, dir)
    assert(st2.total == st1.total, s"rebuild lost rows: $st1 -> $st2")
    assert(st2.skew < st1.skew / 2.0, s"re-cluster did not rebalance: $st1 -> $st2")
    // probe-read bound recovered: the hottest list's corpus fraction shrank
    assert(st2.maxList.toDouble / st2.total < 0.5 * st1.maxList / st1.total)
    // recall through the rebuilt index vs exact top-10 over the full corpus
    val q = emb.filter(col("vec_id") < 3)
    val union = emb.select(col("vec_id"), col("embedding"))
      .unionByName(delta)
    def sims(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("sim")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    // identity recall is ill-posed here — the blob is hundreds of ties at
    // sim ~0.999 — so gate DISTANCE quality (the standard ANN recall at
    // epsilon): every returned neighbor must be as good as the exact
    // 10th, and the result set must be full
    val exact = sims(Similarity.bruteForceTopK(union, q, k = 10))
    val approx = sims(Similarity.ivfTopKFromIndex(spark, dir, q, k = 10, nProbe = 8))
    assert(approx.size == exact.size, s"short result: ${approx.size}/${exact.size}")
    val gap = exact.map(_._2).sum / exact.size - approx.map(_._2).sum / approx.size
    assert(gap < 0.05, s"approx quality degraded: mean-sim gap $gap")
    // and the maintained index is below threshold: no further rebuild
    assert(!Similarity.maintainIvfIndex(spark, dir, maxSkew = 8.0))
  }

  test("IVF index append: old + new vectors equal a rebuild on the stored quantizer") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val (oldHalf, newHalf) =
      (emb.filter(col("vec_id") % 2 === 0), emb.filter(col("vec_id") % 2 =!= 0))
    val q = emb.filter(col("vec_id") < 5)
    val dir = java.nio.file.Files.createTempDirectory("graft_annidx_app_").toString
    Similarity.buildIvfIndex(oldHalf, dir)
    Similarity.appendToIvfIndex(newHalf, dir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = rows(Similarity.ivfTopKFromIndex(spark, dir, q, k = 10, nProbe = 4))
    // reference: the in-memory core over the UNION with the SAME stored
    // quantizer (the append never moves centroids)
    val cents = org.apache.spark.sql.functions.broadcast(
      spark.read.parquet(s"${Similarity.ivfDataRoot(spark, dir)}/centroids"))
    val want = rows(Similarity.ivfCore(emb, q, k = 10, cents, nProbe = 4))
    assert(got == want, s"got=${got.size} want=${want.size} diff=${(got diff want).take(3)}")
    assert(got.nonEmpty)
  }

  test("kcenterCoreset: one pick per planted cluster, non-increasing radii") {
    import spark.implicits._
    // three orthogonal-axis clusters: farthest-first must visit all three
    // before refining any one of them
    def v(axis: Int, j: Double): Seq[Float] =
      (0 until 8).map(i => (if (i == axis) 1.0 else if (i == 7) j else 0.0).toFloat)
    val rows = (0 until 4).map(i => (i.toLong, v(0, 0.01 * i))) ++
      (4 until 8).map(i => (i.toLong, v(1, 0.01 * i))) ++
      (8 until 12).map(i => (i.toLong, v(2, 0.01 * i)))
    val emb = rows.toDF("vec_id", "embedding")
    val out = Similarity.kcenterCoreset(emb, k = 3).collect()
      .sortBy(_.getLong(0))
    assert(out.length == 3)
    assert(out(0).isNullAt(2)) // seed has no radius
    val clusters = out.map(r => r.getLong(1) / 4).toSet
    assert(clusters.size == 3, s"picks must span all clusters: ${out.mkString(",")}")
    // later picks cover no more than earlier ones
    assert(out(1).getDouble(2) >= out(2).getDouble(2))
    // determinism: a second run returns the identical selection
    val again = Similarity.kcenterCoreset(emb, k = 3).collect().sortBy(_.getLong(0))
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("kmeans: partition of the corpus, planted twin lands with its original") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val n = emb.count()
    val out = Similarity.kmeansStats(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // clusters partition the corpus: sizes sum to n, no empty clusters,
    // at most centroidsFor(n) of them, min_member sane, mean sim in range
    assert(out.map(_._2).sum == n)
    assert(out.forall(_._2 >= 1) && out.length <= Similarity.centroidsFor(n))
    assert(out.forall(t => t._4 >= -1.000001 && t._4 <= 1.000001))
    // an exact twin of vector 3 gets the identical assignment vector 3
    // gets (same sims, same deterministic tie-break), so it can never end
    // up a singleton cluster of its own — min_member 999999 must not occur
    val dup = emb.filter(col("vec_id") === 3).withColumn("vec_id", lit(999999L))
    val out2 = Similarity.kmeansStats(emb.unionByName(dup)).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out2.map(_._1).sum == n + 1)
    assert(!out2.exists(_._2 == 999999L), out2.mkString(","))
  }

  test("normalizeUrl canonicalizes scheme/www/tracking/fragment variants") {
    import spark.implicits._
    import graft.ops.TextOps
    val cases = Seq(
      ("http://www.Site.com/a/b?utm_source=x#frag", "site.com/a/b"),
      ("https://site.com/a/b/", "site.com/a/b"),
      ("https://site.com/a/b?utm_source=x&id=5", "site.com/a/b?id=5"),
      ("https://site.com/a/b?id=5&fbclid=abc", "site.com/a/b?id=5"),
      ("site.com/a/b?gclid=1&utm_medium=m", "site.com/a/b"),
      // literal & in the path with NO query: must NOT be rewritten to ?b
      ("https://site.com/a&b", "site.com/a&b"),
      ("https://site.com/a&b?utm_source=x", "site.com/a&b"),
      // mid-stripped param rejoins cleanly on either side
      ("site.com/p?utm_source=x&id=1&utm_medium=m&k=2", "site.com/p?id=1&k=2"),
      ("HTTPS://WWW.SITE.COM", "site.com"))
    val df = cases.toDF("url", "expected")
    val bad = df.withColumn("got", TextOps.normalizeUrl(col("url")))
      .filter(col("got") =!= col("expected")).collect()
    assert(bad.isEmpty, bad.map(r => r.getString(0) + " -> " + r.getString(2)).mkString("; "))
  }

  test("chunk: overlapping windows cover the text; short docs chunk whole") {
    import spark.implicits._
    import graft.ops.Packing
    // 10 words, window 4, overlap 1 → starts 1,4,7,10; start 10 adds
    // only 1 new word past the overlap boundary (10+1 > 10) → dropped
    val df = Seq((1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"), (2L, "a b"))
      .toDF("doc_id", "text")
    val out = Packing.chunk(df, "doc_id", "text", maxWords = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
    assert(d1 == Seq("w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"), d1.toString)
    val d2 = out.filter(_._1 == 2L)
    assert(d2.toSeq == Seq((2L, 0, "a b")))
    // consecutive chunks share exactly `overlap` words
    assert(d1(0).split(" ").last == d1(1).split(" ").head)
  }

  test("packBins: running token sum fills bins in id order per stratum") {
    import spark.implicits._
    import graft.ops.Packing
    val df = Seq(
      ("en", 1L, 300L), ("en", 2L, 300L), ("en", 3L, 300L),
      ("de", 1L, 600L), ("de", 2L, 100L))
      .toDF("lang", "doc_id", "toks")
    val out = Packing.packBins(df, "lang", "doc_id", "toks", seqLen = 512L)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(3))).toMap
    // en: cum-starts 0,300,600 → bins 0,0,1 ; de: 0,600 → bins 0,1
    assert(out == Map(("en", 1L) -> 0L, ("en", 2L) -> 0L, ("en", 3L) -> 1L,
      ("de", 1L) -> 0L, ("de", 2L) -> 1L), out.toString)
  }

  test("contamination: a benchmark copy scores 1.0, disjoint text 0.0") {
    import spark.implicits._
    import graft.ops.Retrieval
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"), // verbatim copy
      (2L, "one two three four five six seven eight"), // disjoint
      (3L, "prefix words alpha beta gamma delta epsilon more tail here"))
      .toDF("doc_id", "text")
    val out = Retrieval.contamination(corpus, bench, "text", w = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(out(1L) == 1.0, out.toString)
    assert(out(2L) == 0.0)
    assert(out(3L) > 0.0 && out(3L) < 1.0)
  }

  test("bm25: more query-term hits score higher at equal length") {
    import spark.implicits._
    import graft.ops.Retrieval
    val corpus = Seq(
      (1L, "spark spark spark filler filler filler filler filler"),
      (2L, "spark filler filler filler filler filler filler filler"),
      (3L, "filler filler filler filler filler filler filler filler"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25(corpus, Seq("spark"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out.contains(1L) && out.contains(2L) && !out.contains(3L))
    assert(out(1L) > out(2L) && out(2L) > 0.0, out.toString)
  }
}

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._
  import graft.ops.Multimodal

  test("PNG encode -> imageio decode recovers exact dimensions and means") {
    import spark.implicits._
    // two-tone 6x4 image: top half 0x204060, bottom 0x80A0C0 — channel
    // means are exactly the midpoints (PNG is lossless)
    val df = Seq((1L, 6, 4, 0x204060, 0x80A0C0)).toDF("id", "w", "h", "t", "b")
      .withColumn("png", Multimodal.encodePng(col("w"), col("h"), col("t"), col("b")))
      .withColumn("s", Multimodal.decodeImageStats(col("png")))
    val r = df.select("s.width", "s.height", "s.mean_r", "s.mean_g", "s.mean_b")
      .head()
    assert(r.getInt(0) == 6 && r.getInt(1) == 4)
    assert(r.getDouble(2) == (0x20 + 0x80) / 2.0)
    assert(r.getDouble(3) == (0x40 + 0xA0) / 2.0)
    assert(r.getDouble(4) == (0x60 + 0xC0) / 2.0)
    // the payload really is a PNG container, not a fake
    val png = df.select("png").head().getAs[Array[Byte]](0)
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
  }

  test("undecodable payloads yield null stats, not errors") {
    import spark.implicits._
    val df = Seq((1L, Array[Byte](1, 2, 3)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
      .withColumn("s", Multimodal.decodeImageStats(col("payload")))
    assert(df.filter(col("s").isNotNull).count() == 0)
  }

  test("WAV encode -> sampled decode recovers exact integer statistics") {
    import spark.implicits._
    // sawtooth s_i = (i*step) mod (2A+1) - A with A=3, step=2, n=7:
    // i*2 mod 7 = 0,2,4,6,1,3,5 → samples -3,-1,1,3,-2,0,2
    val expected = Seq(-3, -1, 1, 3, -2, 0, 2)
    val df = Seq((1L, 8000, 7, 3, 2)).toDF("id", "sr", "n", "a", "st")
      .withColumn("wav", Multimodal.encodeWavSaw(col("sr"), col("n"), col("a"), col("st")))
      .withColumn("s", Multimodal.decodeAudioStats(col("wav")))
    val r = df.select("s.sample_rate", "s.channels", "s.bits",
      "s.n_samples", "s.sum_sq", "s.peak").head()
    assert(r.getInt(0) == 8000 && r.getInt(1) == 1 && r.getInt(2) == 16)
    assert(r.getLong(3) == 7L)
    assert(r.getLong(4) == expected.map(v => v.toLong * v).sum)
    assert(r.getInt(5) == 3)
    // the payload really is a RIFF/WAVE container, not a fake
    val wav = df.select("wav").head().getAs[Array[Byte]](0)
    assert(new String(wav.take(4)) == "RIFF" && new String(wav.slice(8, 12)) == "WAVE")
  }

  test("audio fingerprint: exact window energies, dup detection, null safety") {
    import spark.implicits._
    // n=16 divisible by 8: window w = samples [2w, 2w+2); sawtooth A=3,
    // step=2 → samples cycle -3,-1,1,3,-2,0,2 (period 7)
    val expected = (0 until 16).map(i => ((i * 2) % 7) - 3)
    val df = Seq((1L, 8000, 16, 3, 2), (2L, 8000, 16, 3, 2),
        (3L, 8000, 16, 3, 5))
      .toDF("id", "sr", "n", "a", "st")
      .withColumn("wav", Multimodal.encodeWavSaw(col("sr"), col("n"), col("a"), col("st")))
      .withColumn("f", Multimodal.decodeAudioFingerprint(col("wav")))
    val rows = df.select(col("id"), col("f.n_samples"), col("f.peak"),
      col("f.windows")).collect()
    val byId = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getInt(2), r.getSeq[Long](3))).toMap
    val wantW = (0 until 8).map(w =>
      expected.slice(2 * w, 2 * w + 2).map(v => math.abs(v).toLong).sum)
    assert(byId(1L) == ((16L, 3, wantW)), byId(1L).toString)
    // identical params ⇒ identical fingerprint; different step ⇒ different
    assert(byId(1L) == byId(2L) && byId(1L) != byId(3L))
    // junk and null payloads fingerprint to null, not errors
    val junk = Seq((1L, Array[Byte](9, 9, 9)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
      .withColumn("f", Multimodal.decodeAudioFingerprint(col("payload")))
    assert(junk.filter(col("f").isNotNull).count() == 0)
  }

  test("audio decode rejects junk bytes as null, not errors") {
    import spark.implicits._
    val df = Seq((1L, Array[Byte](9, 9, 9)), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
      .withColumn("s", Multimodal.decodeAudioStats(col("payload")))
    assert(df.filter(col("s").isNotNull).count() == 0)
  }

  test("per-frame AVI decode: exact per-frame channel sums in stream order") {
    import spark.implicits._
    val df = Seq((1L, 5, 4, 3, 40000, 10, 7, 20, 11, 30, 13))
      .toDF("id", "w", "h", "n", "us", "r0", "rs", "g0", "gs", "b0", "bs")
      .withColumn("avi", Multimodal.encodeAviRamp(col("w"), col("h"), col("n"),
        col("us"), col("r0"), col("rs"), col("g0"), col("gs"), col("b0"), col("bs")))
      .withColumn("f", Multimodal.decodeVideoFrames(col("avi")))
    val r = df.select(col("f.width"), col("f.height"), col("f.frame_r"),
      col("f.frame_g"), col("f.frame_b")).head()
    val px = 5L * 4
    assert(r.getInt(0) == 5 && r.getInt(1) == 4)
    // frame f is solid (10+7f, 20+11f, 30+13f): per-frame sum = px·color
    assert(r.getSeq[Long](2) == Seq(10L, 17L, 24L).map(_ * px))
    assert(r.getSeq[Long](3) == Seq(20L, 31L, 42L).map(_ * px))
    assert(r.getSeq[Long](4) == Seq(30L, 43L, 56L).map(_ * px))
  }

  test("AVI encode -> RIFF decode recovers exact header fields and channel sums") {
    import spark.implicits._
    // 3 frames of solid ramp color on a 5x4 canvas (odd width exercises the
    // 4-byte DIB row padding): frame f is (10+7f, 20+11f, 30+13f)
    val df = Seq((1L, 5, 4, 3, 40000, 10, 7, 20, 11, 30, 13))
      .toDF("id", "w", "h", "n", "us", "r0", "rs", "g0", "gs", "b0", "bs")
      .withColumn("avi", Multimodal.encodeAviRamp(col("w"), col("h"), col("n"),
        col("us"), col("r0"), col("rs"), col("g0"), col("gs"), col("b0"), col("bs")))
      .withColumn("s", Multimodal.decodeVideoStats(col("avi")))
    val r = df.select("s.width", "s.height", "s.bit_count", "s.n_frames",
      "s.us_per_frame", "s.frames_read", "s.sum_r", "s.sum_g", "s.sum_b").head()
    assert(r.getInt(0) == 5 && r.getInt(1) == 4 && r.getInt(2) == 24)
    assert(r.getInt(3) == 3 && r.getInt(4) == 40000 && r.getInt(5) == 3)
    val px = 5L * 4
    assert(r.getLong(6) == px * (10 + 17 + 24))
    assert(r.getLong(7) == px * (20 + 31 + 42))
    assert(r.getLong(8) == px * (30 + 43 + 56))
    // the payload really is a RIFF/AVI container, not a fake
    val avi = df.select("avi").head().getAs[Array[Byte]](0)
    assert(new String(avi.take(4)) == "RIFF" && new String(avi.slice(8, 12)) == "AVI ")
  }

  test("video decode rejects junk bytes and truncated RIFF as null, not errors") {
    import spark.implicits._
    val junk = Array[Byte](9, 9, 9)
    val truncated = "RIFF    AVI ".getBytes("US-ASCII")
    val df = Seq((1L, junk), (2L, truncated), (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
      .withColumn("s", Multimodal.decodeVideoStats(col("payload")))
    assert(df.filter(col("s").isNotNull).count() == 0)
  }
}

class AsofJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import graft.ops.AsofJoin

  test("backward as-of: exact ties match, tolerance nulls, tie-break dedup") {
    // series 1: samples at 90, 200, and DUPLICATE ts 200 (ids 10 < 11 —
    // greatest id wins); series 2: one sample far in the past
    val right = Seq(
      (1L, 90L, 1.5, 9L), (1L, 200L, 2.5, 10L), (1L, 200L, 9.9, 11L),
      (2L, 60L, 3.5, 12L)).toDF("k", "ts", "v", "id")
    val left = Seq(
      (101L, 1L, 100L),  // after 90            -> 90/1.5
      (102L, 1L, 200L),  // EXACT tie           -> 200, dup resolved to 9.9
      (103L, 1L, 250L),  // after both          -> 200/9.9
      (104L, 2L, 50L),   // before every sample -> null
      (105L, 2L, 5000L)  // match exists but exceeds tolerance -> null
    ).toDF("event_id", "k", "ts")
    val out = AsofJoin.backward(left, right, "k", "ts", "ts",
        payloadCols = Seq("v"), tieBreak = "id", toleranceMs = 1000L)
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(3)), Option(r.get(4))))
      .toMap
    assert(out(101L) == ((Some(90L), Some(1.5))))
    assert(out(102L) == ((Some(200L), Some(9.9))))
    assert(out(103L) == ((Some(200L), Some(9.9))))
    assert(out(104L) == ((None, None)))
    assert(out(105L) == ((None, None)))
    // left schema passes through unchanged ahead of the asof_ columns
    val cols = AsofJoin.backward(left, right, "k", "ts", "ts",
      Seq("v"), "id").columns.toSeq
    assert(cols == Seq("event_id", "k", "ts", "asof_ts", "asof_v"))
  }

  test("forward as-of mirrors backward: next sample at-or-after, tolerance") {
    val right = Seq(
      (1L, 90L, 1.5, 9L), (1L, 200L, 2.5, 10L), (1L, 200L, 9.9, 11L),
      (2L, 60L, 3.5, 12L)).toDF("k", "ts", "v", "id")
    val left = Seq(
      (101L, 1L, 100L),  // next is 200 -> dup resolved to 9.9
      (102L, 1L, 200L),  // EXACT tie matches forward too
      (103L, 1L, 250L),  // nothing after -> null
      (104L, 2L, 50L),   // next is 60   -> 3.5
      (105L, 2L, 1L)     // 60 exists but 59ms exceeds tolerance 50
    ).toDF("event_id", "k", "ts")
    val out = AsofJoin.forward(left, right, "k", "ts", "ts",
        payloadCols = Seq("v"), tieBreak = "id", toleranceMs = 50L)
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(3)), Option(r.get(4))))
      .toMap
    assert(out(101L) == ((None, None))) // 200-100=100 > tol 50
    assert(out(102L) == ((Some(200L), Some(9.9))))
    assert(out(103L) == ((None, None)))
    assert(out(104L) == ((Some(60L), Some(3.5))))
    assert(out(105L) == ((None, None)))
    // with a loose tolerance 101 gets its next sample
    val loose = AsofJoin.forward(left, right, "k", "ts", "ts",
        Seq("v"), "id").collect()
      .map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(loose(101L) == Some(200L))
  }
}

class RangeJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import graft.ops.RangeJoin

  test("point-in-interval: half-open bounds, bucket crossing, key isolation") {
    // bucket = 100ms; interval A spans 3 buckets (50, 320), B is tiny,
    // C sits on another key
    val iv = Seq(
      (1L, 50L, 320L, "A"), (1L, 200L, 210L, "B"), (2L, 0L, 1000L, "C"))
      .toDF("k", "s", "e", "name")
    val pts = Seq(
      (1L, 1L, 50L),   // == start -> inside A
      (2L, 1L, 205L),  // inside A and B (two output rows)
      (3L, 1L, 319L),  // last ms of A, crossed 2 bucket boundaries
      (4L, 1L, 320L),  // == end -> OUTSIDE (half-open)
      (5L, 2L, 205L),  // other key -> only C
      (6L, 1L, 999L)   // no interval on key 1 covers it
    ).toDF("pid", "k", "ts")
    val out = RangeJoin.pointInInterval(pts, iv, "k", "ts", "s", "e",
        payloadCols = Seq("name"), bucketMs = 100L)
      .select(col("pid"), col("iv_name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "A"), (2L, "A"), (2L, "B"), (3L, "A"), (5L, "C")),
      out.toString)
    // zero/negative-length intervals never match
    val deg = Seq((1L, 100L, 100L, "Z")).toDF("k", "s", "e", "name")
    assert(RangeJoin.pointInInterval(pts, deg, "k", "ts", "s", "e",
      Seq("name"), 100L).count() == 0)
  }
}
