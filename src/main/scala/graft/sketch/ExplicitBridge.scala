package graft.sketch

/** OTel explicit-bounds histogram → DDSketch bridge.
  *
  * Unlike the exponential case (exact log-bin map, [[ExpoBridge]]),
  * explicit bounds are arbitrary, so each bucket's mass re-bins at its
  * midpoint representative — the standard re-sampling when converting
  * fixed-bucket histograms into log-bucket sketches; error is bounded by
  * the source histogram's own bucket width (the histogram can't resolve
  * finer anyway). Edge buckets use the datapoint's min/max as their
  * finite edge. Exact count/sum/min/max come from the datapoint itself,
  * so `ddsketch_stats` stays exact; quantile reads then ride the shared
  * sketch machinery (merge, rank walk, [min,max] clamp). This completes
  * quantile coverage for every ingested histogram kind: pre-agg sketches,
  * exponential histograms, and explicit-bounds histograms.
  */
object ExplicitBridge {

  /** representative value per bucket: midpoint of the bucket's finite
    * range; bucket 0 is (min, bounds(0)], bucket n is (bounds(n-1), max]
    */
  def representatives(bounds: Seq[Double], min: Double, max: Double): Seq[Double] = {
    val n = bounds.size
    (0 to n).map { i =>
      val lo = if (i == 0) min else bounds(i - 1)
      val hi = if (i == n) max else bounds(i)
      (lo + hi) / 2.0
    }
  }

  def fromExplicit(bucketCounts: Seq[Long], bounds: Seq[Double],
      count: Long, sum: Double, min: Double, max: Double): DDSketch = {
    val sk = new DDSketch()
    representatives(bounds, min, max).zip(bucketCounts).foreach { case (r, c) =>
      if (c > 0) sk.add(r, c)
    }
    // the datapoint's own stats are authoritative (midpoint insertion
    // would otherwise approximate sum and pin min/max to representatives)
    sk.count = count
    sk.sum = sum
    sk.min = min
    sk.max = max
    sk
  }
}
