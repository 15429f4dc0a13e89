package graft.sketch

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Count-Min sketch: d hash rows × w counters, point estimate = min over
  * rows — the standard heavy-hitter / frequency sketch (Cormode &
  * Muthukrishnan, J. Algorithms 2005).
  *
  * Determinism across engines: counter updates are commutative adds, so
  * the sketch is merge-order-insensitive, and the row hashes derive from
  * md5 (`first 12 hex digits of md5("<j>|<value>") mod w` — the repo's
  * hash48 convention), so an external engine recomputes every cell and
  * estimate bit-for-bit. No RNG, no seed state beyond the row index.
  */
final class CountMin(val depth: Int, val width: Int) {
  require(depth > 0 && width > 0, "depth and width must be positive")
  val cells = new Array[Long](depth * width)
  private var total = 0L

  def count: Long = total
  def isEmpty: Boolean = total == 0L
  private[sketch] def setTotal(n: Long): Unit = total = n

  private def cell(j: Int, value: String): Int =
    (CountMin.hash48(s"$j|$value") % width).toInt

  def add(value: String, n: Long = 1L): Unit = {
    var j = 0
    while (j < depth) {
      cells(j * width + cell(j, value)) += n
      j += 1
    }
    total += n
  }

  /** point frequency estimate: never under the true count */
  def estimate(value: String): Long = {
    var est = Long.MaxValue
    var j = 0
    while (j < depth) {
      val c = cells(j * width + cell(j, value))
      if (c < est) est = c
      j += 1
    }
    est
  }

  def merge(other: CountMin): CountMin = {
    require(other.depth == depth && other.width == width,
      s"CountMin shape mismatch: ${depth}x$width vs ${other.depth}x${other.width}")
    var i = 0
    while (i < cells.length) { cells(i) += other.cells(i); i += 1 }
    total += other.total
    this
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(1 + 4 + 4 + 8 + cells.length * 8)
    bb.put(CountMin.Version)
    bb.putInt(depth); bb.putInt(width); bb.putLong(total)
    var i = 0
    while (i < cells.length) { bb.putLong(cells(i)); i += 1 }
    bb.array()
  }
}

object CountMin {
  val Version: Byte = 1
  val DefaultDepth = 4
  val DefaultWidth = 1024

  /** 48-bit md5 prefix of a string — identical to the engine-neutral
    * `conv(substring(md5(s), 1, 12), 16, 10)` the Column-side ops use
    */
  def hash48(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 6) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  def deserialize(bytes: Array[Byte]): CountMin = {
    val bb = ByteBuffer.wrap(bytes)
    val v = bb.get()
    require(v == Version, s"unknown CountMin version $v")
    val d = bb.getInt; val w = bb.getInt
    val sk = new CountMin(d, w)
    val total = bb.getLong
    var i = 0
    while (i < sk.cells.length) { sk.cells(i) = bb.getLong; i += 1 }
    sk.setTotal(total)
    sk
  }

  private[sketch] def empty(d: Int, w: Int) = new CountMin(d, w)
}
