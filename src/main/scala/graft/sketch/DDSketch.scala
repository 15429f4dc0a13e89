package graft.sketch

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** DDSketch — fully-mergeable quantile sketch with relative-error guarantee.
  *
  * Implementation from the public algorithm (Masson, Rim, Lee, "DDSketch: A
  * Fast and Fully-Mergeable Quantile Sketch with Relative-Error Guarantees",
  * VLDB 2019): logarithmic bucket mapping index = ceil(log_gamma(x)) with
  * gamma = (1+alpha)/(1-alpha); buckets collapse from the lowest index when
  * the bin budget is exhausted, preserving the upper-quantile guarantee.
  *
  * Role parity with the reference's `chq_sketch` column + custom
  * `ddsketch_stats_agg` DuckDB extension
  * (/root/reference/internal/metricsprocessing/metric_ingest_duckdb.go:427-429,
  * /root/reference/docs/design/db-parquet/metrics.md:39-47). The byte
  * encoding here is graft's own (documented, versioned) — DataDog proto
  * byte-compatibility is intentionally not a goal (SURVEY.md §7.4.3).
  *
  * Exact stats (count/sum/min/max) ride along so `ddsketch_stats` is exact
  * while quantiles are alpha-relative-accurate.
  */
final class DDSketch(
    val alpha: Double = DDSketch.DefaultAlpha,
    val maxBins: Int = DDSketch.DefaultMaxBins) extends Serializable {

  private val gamma = (1.0 + alpha) / (1.0 - alpha)
  private val logGamma = math.log(gamma)
  /** values below this collapse into the zero bucket */
  private val minIndexable = 1e-9

  // positive / negative magnitude stores: bucket index → count
  private[sketch] val pos = mutable.LongMap.empty[Long]
  private[sketch] val neg = mutable.LongMap.empty[Long]
  private[sketch] var zeroCount: Long = 0L

  var count: Long = 0L
  var sum: Double = 0.0
  var min: Double = Double.PositiveInfinity
  var max: Double = Double.NegativeInfinity

  private def indexOf(x: Double): Int = math.ceil(math.log(x) / logGamma).toInt

  /** bucket midpoint value: 2*gamma^i/(gamma+1) */
  private def valueOf(i: Int): Double = 2.0 * math.pow(gamma, i) / (gamma + 1.0)

  def add(x: Double): Unit = add(x, 1L)

  def add(x: Double, n: Long): Unit = {
    if (x.isNaN || n <= 0) return
    count += n
    sum += x * n
    if (x < min) min = x
    if (x > max) max = x
    if (math.abs(x) < minIndexable) zeroCount += n
    else if (x > 0) bump(pos, indexOf(x), n)
    else bump(neg, indexOf(-x), n)
  }

  private def bump(store: mutable.LongMap[Long], i: Int, n: Long): Unit = {
    store(i) = store.getOrElse(i.toLong, 0L) + n
    if (store.size > maxBins) collapseLowest(store)
  }

  /** collapse the two lowest buckets (paper's collapsing store) */
  private def collapseLowest(store: mutable.LongMap[Long]): Unit = {
    if (store.size < 2) return
    val keys = store.keys.toArray.sorted
    val lo = keys(0); val next = keys(1)
    store(next) = store(next) + store(lo)
    store.remove(lo)
  }

  def merge(other: DDSketch): DDSketch = {
    require(other.alpha == alpha, s"alpha mismatch: $alpha vs ${other.alpha}")
    other.pos.foreach { case (i, n) => bump(pos, i.toInt, n) }
    other.neg.foreach { case (i, n) => bump(neg, i.toInt, n) }
    zeroCount += other.zeroCount
    count += other.count
    sum += other.sum
    if (other.min < min) min = other.min
    if (other.max > max) max = other.max
    this
  }

  /** value at quantile q in [0,1]; NaN when empty. Exact min/max at ends. */
  def quantile(q: Double): Double = {
    if (count == 0) return Double.NaN
    if (q <= 0.0) return min
    if (q >= 1.0) return max
    val rank = (q * (count - 1)).toLong + 1
    var cum = 0L
    // negatives first (ascending value = descending magnitude index)
    val negKeys = neg.keys.toArray.sorted.reverse
    for (i <- negKeys) {
      cum += neg(i.toInt)
      if (cum >= rank) return -valueOf(i.toInt)
    }
    cum += zeroCount
    if (cum >= rank) return 0.0
    val posKeys = pos.keys.toArray.sorted
    for (i <- posKeys) {
      cum += pos(i.toInt)
      if (cum >= rank) return clampToRange(valueOf(i.toInt))
    }
    max
  }

  private def clampToRange(v: Double): Double =
    if (v < min) min else if (v > max) max else v

  def avg: Double = if (count == 0) Double.NaN else sum / count

  /** fraction of observations whose READ-BACK value lies in [lo, hi]:
    * zero-bucket observations read back 0.0, bucket i reads back
    * ±2γ^i/(γ+1) (the same midpoint convention quantile() walks) — a
    * deterministic bucket-membership rule an external replay can follow
    * exactly, unlike Prometheus's within-bucket interpolation
    */
  def fractionBetween(lo: Double, hi: Double): Double = {
    if (count == 0) return Double.NaN
    if (lo > hi) return 0.0
    var matched = 0L
    if (lo <= 0.0 && hi >= 0.0) matched += zeroCount
    neg.foreach { case (i, c) =>
      val v = -valueOf(i.toInt); if (v >= lo && v <= hi) matched += c
    }
    pos.foreach { case (i, c) =>
      val v = valueOf(i.toInt); if (v >= lo && v <= hi) matched += c
    }
    matched.toDouble / count
  }

  /** population variance of the READ-BACK values (zero bucket → 0.0,
    * bucket i → ±2γ^i/(γ+1)), exact-sums form folded in ASCENDING
    * read-back-value order — a canonical order an external replay can walk
    * identically (ordered list_reduce in SQL), so the float sums are
    * bit-reproducible, unlike a hash-map iteration
    */
  def readbackVariance: Double = {
    if (count == 0) return Double.NaN
    val parts =
      neg.toSeq.map { case (i, c) => (-valueOf(i.toInt), c) }.sortBy(_._1) ++
        (if (zeroCount > 0) Seq((0.0, zeroCount)) else Nil) ++
        pos.toSeq.map { case (i, c) => (valueOf(i.toInt), c) }.sortBy(_._1)
    var sv = 0.0
    var svv = 0.0
    parts.foreach { case (v, c) => sv += c * v; svv += c * v * v }
    val n = count.toDouble
    (n * svv - sv * sv) / (n * n)
  }

  /** total live buckets across both stores (bin-budget observability) */
  def binCount: Int = pos.size + neg.size

  def isEmpty: Boolean = count == 0

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(DDSketch.FormatVersion)
    out.writeDouble(alpha)
    out.writeInt(maxBins)
    out.writeLong(zeroCount)
    out.writeLong(count)
    out.writeDouble(sum)
    out.writeDouble(min)
    out.writeDouble(max)
    def writeStore(s: mutable.LongMap[Long]): Unit = {
      out.writeInt(s.size)
      s.foreach { case (i, n) => out.writeInt(i.toInt); out.writeLong(n) }
    }
    writeStore(pos)
    writeStore(neg)
    out.flush()
    bos.toByteArray
  }
}

object DDSketch {
  val DefaultAlpha = 0.01
  val DefaultMaxBins = 2048
  val FormatVersion = 1

  def deserialize(bytes: Array[Byte]): DDSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val ver = in.readByte()
    require(ver == FormatVersion, s"unknown DDSketch format $ver")
    val alpha = in.readDouble()
    val maxBins = in.readInt()
    val sk = new DDSketch(alpha, maxBins)
    sk.zeroCount = in.readLong()
    sk.count = in.readLong()
    sk.sum = in.readDouble()
    sk.min = in.readDouble()
    sk.max = in.readDouble()
    def readStore(s: mutable.LongMap[Long]): Unit = {
      val n = in.readInt()
      var k = 0
      while (k < n) { val i = in.readInt(); val c = in.readLong(); s(i) = c; k += 1 }
    }
    readStore(sk.pos)
    readStore(sk.neg)
    sk
  }
}
