package graft.sketch

/** OTel exponential-histogram → DDSketch bridge.
  *
  * Both structures are log-bucket histograms: an expo datapoint at `scale`
  * has base = 2^(2^-scale) and positive bucket j covering
  * (base^(offset+j), base^(offset+j+1)]; a DDSketch bin i covers
  * (gamma^(i-1), gamma^i]. With gamma = base the mapping is EXACT bin to
  * bin (i = offset+j+1) — no re-sampling, no accuracy loss beyond the
  * histogram's own resolution. Quantile reads then ride the existing
  * sketch machinery (merge across datapoints of equal scale, midpoint
  * read, zero bucket, [min,max] clamp).
  */
object ExpoBridge {

  /** alpha whose computed gamma (1+a)/(1-a) lands as close to `base` as
    * doubles allow — nudged by ulps; for base 2 no alpha maps exactly, so
    * gamma sits within one ulp. The resulting ~1e-16 relative error on
    * bucket midpoints is far inside the round-6 oracle window.
    */
  def alphaFor(base: Double): Double = {
    var a = (base - 1.0) / (base + 1.0)
    def g(x: Double) = (1.0 + x) / (1.0 - x)
    var i = 0
    while (g(a) != base && i < 64) {
      a = if (g(a) > base) math.nextDown(a) else math.nextUp(a)
      i += 1
    }
    a
  }

  def baseFor(scale: Int): Double = math.pow(2.0, math.pow(2.0, -scale.toDouble))

  def fromExpo(scale: Int, zeroCount: Long,
      posOffset: Int, posCounts: Seq[Long],
      negOffset: Int, negCounts: Seq[Long],
      count: Long, sum: Double, min: Double, max: Double): DDSketch = {
    val sk = new DDSketch(alphaFor(baseFor(scale)))
    posCounts.zipWithIndex.foreach { case (c, j) =>
      if (c > 0) sk.pos(posOffset + j + 1) = c
    }
    negCounts.zipWithIndex.foreach { case (c, j) =>
      if (c > 0) sk.neg(negOffset + j + 1) = c
    }
    sk.zeroCount = zeroCount
    sk.count = count
    sk.sum = sum
    sk.min = min
    sk.max = max
    sk
  }
}
