package graft.logql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** LogQL `ip("pattern")` matching (Loki's ip filter; beyond the
  * reference's LogQL surface, which has no ip form). IPv4 only —
  * patterns are a single address ("192.168.0.1"), an inclusive range
  * ("192.168.0.10-192.168.0.20"), or CIDR ("192.168.0.0/16"). The
  * pattern compiles to a [lo, hi] uint32 interval at PLAN time; row-side
  * work is a codegen'd parse-to-long + range compare — no regex engine in
  * the comparison itself, and the identical integer arithmetic replays in
  * the DuckDB oracle.
  */
object IpMatch {

  /** inclusive uint32 interval of a pattern; throws on malformed input
    * (plan-time validation, like a regex syntax error)
    */
  def rangeOf(pattern: String): (Long, Long) = {
    def ip(s: String): Long = {
      val parts = s.trim.split("\\.")
      require(parts.length == 4, s"not an IPv4 address: $s")
      parts.foldLeft(0L) { (acc, p) =>
        val o = p.toInt
        require(o >= 0 && o <= 255, s"octet out of range in $s")
        acc * 256 + o
      }
    }
    pattern match {
      case p if p.contains('/') =>
        val Array(base, bitsS) = p.split("/", 2)
        val bits = bitsS.toInt
        require(bits >= 0 && bits <= 32, s"bad CIDR width: $pattern")
        val mask = if (bits == 0) 0L else (0xffffffffL << (32 - bits)) & 0xffffffffL
        val lo = ip(base) & mask
        (lo, lo | (~mask & 0xffffffffL))
      case p if p.contains('-') =>
        val Array(a, b) = p.split("-", 2)
        val (lo, hi) = (ip(a), ip(b))
        require(lo <= hi, s"inverted range: $pattern")
        (lo, hi)
      case p => val v = ip(p); (v, v)
    }
  }

  /** the dotted-quad shape both engines extract and parse */
  val Ipv4Regex = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** dotted quad → uint32 as long; null when not a valid IPv4 (shape or
    * octet range) — null propagates to a non-match through `between`
    */
  def ipToLong(c: Column): Column = {
    val shaped = c.rlike("^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}$")
    val octets = split(c, "\\.")
    val inRange = !exists(octets, o => o.cast("int") > 255)
    val value = aggregate(octets, lit(0L), (a, o) => a * 256 + o.cast("long"))
    when(shaped && inRange, value)
  }

  /** label form: value is an in-range IPv4 (false for unparseable) */
  def labelCond(c: Column, pattern: String): Column = {
    val (lo, hi) = rangeOf(pattern)
    coalesce(ipToLong(c).between(lo, hi), lit(false))
  }

  /** line form: the line contains at least one in-range IPv4 */
  def lineCond(line: Column, pattern: String): Column = {
    val (lo, hi) = rangeOf(pattern)
    val candidates = regexp_extract_all(line, lit(Ipv4Regex), lit(0))
    coalesce(exists(candidates, x => ipToLong(x).between(lo, hi)), lit(false))
  }
}
