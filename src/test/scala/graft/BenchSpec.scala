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
    // sub-200ms baselines are noise, never flagged
    assert(Bench.regressionFlag(0.25, Some(0.1), noted = false).isEmpty)
    // a noted row with a real baseline still flags on true regression
    assert(Bench.regressionFlag(2.0, Some(1.0), noted = true).contains(1.0))
  }

  test("retry guard fires for both flag paths before a flag can land") {
    assert(Bench.wantsRetry(8.4, None, noted = false))
    assert(!Bench.wantsRetry(2.0, None, noted = false))
    assert(!Bench.wantsRetry(8.4, None, noted = true))
    assert(Bench.wantsRetry(0.09, Some(0.05), noted = false))
    assert(!Bench.wantsRetry(0.06, Some(0.05), noted = false))
  }
}
