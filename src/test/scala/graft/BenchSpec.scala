package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates on the bench harness's regression-flag decision — in particular
  * that a query with NO baseline entry (it errored last round, so the
  * prior bench has no time for it) is still flaggable: r8's 161 errors
  * left every one of those queries unflaggable in r9, which is how a
  * 8.4× slowdown escaped while six smaller multipliers were flagged.
  */
class BenchSpec extends AnyFunSuite {

  test("no-baseline queries flag against the absolute threshold") {
    // errored-last-round (no baseline) + slow now -> flagged
    assert(Bench.regressionFlag(8.4, None, noted = false).contains(3.0))
    // fast enough -> not flagged
    assert(Bench.regressionFlag(2.9, None, noted = false).isEmpty)
    // documented intrinsically-heavy row -> exempt from the absolute flag
    assert(Bench.regressionFlag(9.3, None, noted = true).isEmpty)
  }

  test("baselined queries keep the 1.5x / 200ms-floor semantics") {
    assert(Bench.regressionFlag(0.9, Some(0.5), noted = false).contains(0.5))
    assert(Bench.regressionFlag(0.6, Some(0.5), noted = false).isEmpty)
    // sub-200ms baselines are RATIO noise, never ratio-flagged...
    assert(Bench.regressionFlag(0.25, Some(0.1), noted = false).isEmpty)
    // ...but keep the absolute ceiling: with committed seeding every row
    // has a Some baseline, so a 0.1s row regressing to 8.4s must still
    // flag through the floor (r13 review find)
    assert(Bench.regressionFlag(8.4, Some(0.1), noted = false).contains(3.0))
    assert(Bench.regressionFlag(8.4, Some(0.1), noted = true).isEmpty)
    assert(Bench.wantsRetry(8.4, Some(0.01), noted = false))
    assert(!Bench.wantsRetry(2.0, Some(0.01), noted = false))
    // a noted row with a real baseline still flags on true regression
    assert(Bench.regressionFlag(2.0, Some(1.0), noted = true).contains(1.0))
    // volatile rows (r15 A/B-adjudicated ~2x identical-code swing) widen
    // to 2.5x: the swing band passes, a real 3x regression still flags
    assert(Bench.regressionFlag(2.0, Some(1.0), noted = true,
      volatileRow = true).isEmpty)
    assert(Bench.regressionFlag(3.0, Some(1.0), noted = true,
      volatileRow = true).contains(1.0))
    assert(Bench.volatileRows.contains("pp_simhash_pairs"))
  }

  test("retry guard fires for both flag paths before a flag can land") {
    assert(Bench.wantsRetry(8.4, None, noted = false))
    assert(!Bench.wantsRetry(2.0, None, noted = false))
    assert(!Bench.wantsRetry(8.4, None, noted = true))
    assert(Bench.wantsRetry(0.09, Some(0.05), noted = false))
    assert(!Bench.wantsRetry(0.06, Some(0.05), noted = false))
  }

  // ---- twoPassSchedule: synthetic contention windows ----------------
  // Model the host as a global attempt clock; attempts whose tick falls
  // inside [w0, w1) report 4x the query's true time. This is exactly the
  // r9-r11 failure mode: a contiguous contended window inflates whichever
  // queries run during it.

  private def contendedRun(names: Seq[String], trueTime: Map[String, Double],
      w0: Int, w1: Int, seed: Long): (Map[String, Seq[Double]], Seq[String]) = {
    var tick = -1
    Bench.twoPassSchedule[Double](names, seed,
      attempt = { n =>
        tick += 1
        if (tick >= w0 && tick < w1) trueTime(n) * 4 else trueTime(n)
      },
      stillSuspect = (n, as) =>
        Bench.wantsRetry(as.min, Some(1.0), noted = false))
  }

  test("deferred second pass clears flags created by a contended window") {
    val names = (0 until 20).map(i => f"q$i%02d")
    val base = names.map(_ -> 1.0).toMap
    // window [10, 30) covers both pass-1 attempts of ~10 shuffled queries
    val (res, retried) = contendedRun(names, base, 10, 30, seed = 42L)
    // the window DID create suspects (both attempts inflated for some rows)
    assert(retried.nonEmpty)
    // the old inline-retry behavior would have confirmed them: the third
    // attempt of a suspect at tick t, t+1 runs at t+2, still in-window
    // (min-of-3 = 4.0 -> flag). The deferred pass runs after tick 40,
    // outside the window, so every flag clears.
    names.foreach { n =>
      assert(Bench.regressionFlag(res(n).min, Some(1.0), noted = false).isEmpty,
        s"$n should not be flagged: attempts=${res(n)}")
    }
    // suspects got extra attempts; clean rows got exactly cold+warm
    retried.foreach(n => assert(res(n).size > 2))
    names.filterNot(retried.contains).foreach(n => assert(res(n).size == 2))
  }

  test("a real regression survives the deferred pass and still flags") {
    val names = (0 until 20).map(i => f"q$i%02d")
    // q07 genuinely regressed to 4x; everything else is clean
    val base = names.map(n => n -> (if (n == "q07") 4.0 else 1.0)).toMap
    val (res, retried) = contendedRun(names, base, 10, 30, seed = 7L)
    assert(retried.contains("q07"))
    assert(Bench.regressionFlag(res("q07").min, Some(1.0), noted = false)
      .contains(1.0))
    (names.toSet - "q07").foreach { n =>
      assert(Bench.regressionFlag(res(n).min, Some(1.0), noted = false).isEmpty)
    }
  }

  // ---- r13: None-baseline seeding + run-level inflation scaling -----
  // r12's driver run exposed two holes: (a) a row absent from the
  // driver's compact baseline fell to the 3.0 s absolute floor and
  // pp_knn_eval was flagged at a literal 1.00x vs its committed time;
  // (b) the whole run was +51% task CPU at the same HEAD and all six
  // flags were host noise. These gates pin both fixes.

  test("extractNumMap pulls the right map out of every artifact shape") {
    // committed BENCH_FULL-style single line: cold values must NOT bleed
    // into the queries map (the old whole-file scan let cold overwrite warm)
    val full = """{"metric":"total","value":9.9,"queries":{"q_a":1.000,"q_b":0.400},""" +
      """"cpu":{"q_a":0.800,"q_b":0.300},"cold":{"q_a":5.000,"q_b":2.000},"seed":42}"""
    assert(Bench.extractNumMap(full, "queries") == Map("q_a" -> 1.0, "q_b" -> 0.4))
    assert(Bench.extractNumMap(full, "cpu") == Map("q_a" -> 0.8, "q_b" -> 0.3))
    // driver wrapper: pretty-printed, map nested under "parsed", plus an
    // escaped-quote echo of the line inside the "tail" string — the
    // structured copy wins and the escaped copy still parses if alone
    val wrapped = "{\n  \"n\": 12,\n  \"tail\": \"stuff {\\\"queries\\\":{\\\"q_a\\\":9.000}}\",\n" +
      "  \"parsed\": {\"metric\": \"total\", \"queries\": {\"q_a\": 1.100, \"q_b\": 0.500}}\n}"
    assert(Bench.extractNumMap(wrapped, "queries") == Map("q_a" -> 1.1, "q_b" -> 0.5))
    val tailOnly = "{\"tail\": \"x {\\\"queries\\\":{\\\"q_a\\\":9.000}} y\"}"
    assert(Bench.extractNumMap(tailOnly, "queries") == Map("q_a" -> 9.0))
    // absent key -> empty, not a crash
    assert(Bench.extractNumMap(full, "nope").isEmpty)
    // a future artifact nesting an OBJECT inside the named map must not
    // silently truncate the baseline at the inner '}' (r13 VERDICT #6):
    // the nested occurrence is skipped, a later flat occurrence still wins
    val nested = """{"queries":{"q_a":{"warm":1.0,"cold":5.0},"q_b":2.0},""" +
      """"parsed":{"queries":{"q_a":1.000,"q_b":2.000}}}"""
    assert(Bench.extractNumMap(nested, "queries") ==
      Map("q_a" -> 1.0, "q_b" -> 2.0))
    // nested-only shape: nothing parses (no truncated partial map)
    val nestedOnly = """{"queries":{"q_a":{"warm":1.0},"q_b":2.0}}"""
    assert(Bench.extractNumMap(nestedOnly, "queries").isEmpty)
  }

  test("a new row matching its committed time never flags (seeded baseline)") {
    // driver baseline lacks the row; committed has 3.187 s; warm 3.013 s
    // (r12's literal false flag). With the committed seed the row is
    // baselined and 3.013 < 3.187*1.5 -> no flag.
    val committed = Map("pp_knn_eval" -> 3.187)
    val envBaseline = Map.empty[String, Double]
    val seeded = (envBaseline.keySet ++ committed.keySet).map { k =>
      k -> math.max(envBaseline.getOrElse(k, 0.0), committed.getOrElse(k, 0.0))
    }.toMap
    assert(Bench.regressionFlag(3.013, seeded.get("pp_knn_eval"), noted = false).isEmpty)
    // and a REAL regression vs committed still flags
    assert(Bench.regressionFlag(5.2, seeded.get("pp_knn_eval"), noted = false)
      .contains(3.187))
  }

  test("inflation factor scales flag thresholds; guards keep it honest") {
    // +60% CPU run-wide on 25 common rows -> factor ~1.6
    val base = (0 until 25).map(i => s"q$i" -> 1.0).toMap
    val cur = base.map { case (k, v) => k -> v * 1.6 }
    val f = Bench.inflationFactor(cur, base)
    assert(math.abs(f - 1.6) < 1e-9)
    // a 1.5x-inflated warm time inside that run does not flag...
    assert(Bench.regressionFlag(1.55, Some(1.0), noted = false, inflate = f).isEmpty)
    // ...but a true 3x regression still does
    assert(Bench.regressionFlag(3.0, Some(1.0), noted = false, inflate = f)
      .contains(1.0))
    // the absolute-floor path scales too
    assert(Bench.regressionFlag(3.2, None, noted = false, inflate = f).isEmpty)
    assert(Bench.regressionFlag(5.0, None, noted = false, inflate = f).contains(3.0))
    // guards: too few common rows, too little CPU mass, faster run, cap
    assert(Bench.inflationFactor(Map("a" -> 9.0), Map("a" -> 1.0)) == 1.0)
    val tiny = (0 until 25).map(i => s"q$i" -> 0.01).toMap
    assert(Bench.inflationFactor(tiny.map { case (k, v) => k -> v * 3 }, tiny) == 1.0)
    assert(Bench.inflationFactor(base.map { case (k, v) => k -> v * 0.7 }, base) == 1.0)
    assert(Bench.inflationFactor(base.map { case (k, v) => k -> v * 9 }, base) == 4.0)
  }

  test("wall-only contention scales thresholds even when CPU is flat") {
    // r13 observation: a run with cpu_total within 0.5% of committed but
    // wall +29% run-wide (I/O/scheduler contention) — the CPU factor
    // alone sees nothing; the max-of-both composition must catch it
    val base = (0 until 25).map(i => s"q$i" -> 1.0).toMap
    val wallInflated = base.map { case (k, v) => k -> v * 1.3 }
    val f = math.max(Bench.inflationFactor(base, base),
      Bench.inflationFactor(wallInflated, base))
    assert(math.abs(f - 1.3) < 1e-9)
    assert(Bench.regressionFlag(1.6, Some(1.0), noted = false, inflate = f).isEmpty)
    assert(Bench.regressionFlag(2.5, Some(1.0), noted = false, inflate = f)
      .contains(1.0))
  }

  // ---- r17: inflation-aware retry skip (VERDICT r16 #3 cost triage) --
  // r16's driver run re-ran ~25% of the catalog (n_retry 73) at inflation
  // 1.24 — every one of those retries confirmed a suppression the
  // run-level factor already explained. The retry guard now scales by the
  // PROVISIONAL pass-1 factor: suspects inside the explained band skip
  // pass 2; anything past the inflated bar still retries and must survive
  // the time-separated pass to flag.

  test("retry guard scales with the provisional inflation factor") {
    // inside the explained band on a 1.25x host -> no retry burned
    assert(!Bench.wantsRetry(1.6, Some(1.0), noted = false, inflate = 1.25))
    // same warm on a quiet host -> still a suspect
    assert(Bench.wantsRetry(1.6, Some(1.0), noted = false))
    // a real regression clears the inflated bar and still retries
    assert(Bench.wantsRetry(3.0, Some(1.0), noted = false, inflate = 1.25))
    // the absolute-floor path scales the same way
    assert(!Bench.wantsRetry(3.4, None, noted = false, inflate = 1.25))
    assert(Bench.wantsRetry(5.0, None, noted = false, inflate = 1.25))
  }

  test("uniform host inflation retries ~nothing; a real regression still flags") {
    // model a 1.6x-inflated host: EVERY attempt reads 1.6x true time;
    // q07 additionally regressed 3x for real. Mirrors main's composition:
    // pass-1 accumulators -> memoized provisional factor -> scaled guard.
    val names = (0 until 25).map(i => f"q$i%02d")
    val trueTime = names.map(n => n -> (if (n == "q07") 3.0 else 1.0)).toMap
    val base = names.map(_ -> 1.0).toMap
    val p1 = scala.collection.mutable.Map[String, Double]()
    var prov = -1.0
    def inflP1(): Double = {
      if (prov < 0) prov = Bench.inflationFactor(p1.toMap, base)
      prov
    }
    val (res, retried) = Bench.twoPassSchedule[Double](names, 42L,
      attempt = { n =>
        val w = trueTime(n) * 1.6
        p1(n) = math.min(w, p1.getOrElse(n, Double.MaxValue))
        w
      },
      stillSuspect = (n, as) =>
        Bench.wantsRetry(as.min, base.get(n), noted = false, inflate = inflP1()))
    // provisional factor = (24·1.6 + 4.8)/25 ≈ 1.73
    assert(inflP1() > 1.6 && inflP1() < 1.85)
    // the uniformly-inflated rows are explained by the factor: no retries
    assert(retried == Seq("q07"), s"retried=$retried")
    // and the real regression still flags at the final scaled threshold
    assert(Bench.regressionFlag(res("q07").min, base.get("q07"),
      noted = false, inflate = inflP1()).contains(1.0))
    // old behavior for contrast: the unscaled guard would have retried all
    names.foreach(n => assert(
      Bench.wantsRetry(res(n).head, base.get(n), noted = false)))
  }

  test("schedule is deterministic per seed and covers every query") {
    val names = (0 until 12).map(i => s"q$i")
    def order(seed: Long): Seq[String] = {
      val visited = scala.collection.mutable.ArrayBuffer[String]()
      Bench.twoPassSchedule[Double](names, seed,
        attempt = { n => visited += n; 1.0 },
        stillSuspect = (_, _) => false)
      visited.toSeq
    }
    val a = order(123L); val b = order(123L); val c = order(124L)
    assert(a == b)                 // replayable order-exactly
    assert(a != c)                 // the seed actually drives the order
    assert(a.toSet == names.toSet) // full coverage
    assert(a.size == names.size * 2) // cold+warm each, nothing more
    // pass-1 order is shuffled, not catalog order
    assert(a.grouped(2).map(_.head).toSeq != names)
  }
}
