package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F21 — IPv4 scalar family: the ClickHouse `IPv4StringToNum` /
  * `IPv4NumToString` / CIDR-membership surface, the address
  * arithmetic every network-telemetry pipeline groups and filters by
  * (subnet rollups, allowlist probes, /24 aggregation).
  *
  * Everything is integer shift/mask arithmetic and one regex guard —
  * no UDFs, and every tree is mirrored token-for-token by the SQL
  * face. Numbers ride BIGINT (an IPv4 is 32 unsigned bits — long is
  * exact on both engines; HUGEINT never enters).
  */
object IpFns {

  private val OctetPat =
    "^([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})$"

  /** Dotted-quad string → unsigned 32-bit value as BIGINT; null for
    * anything that is not four in-range octets.
    */
  def ipv4ToNum(ip: Column): Column = {
    val oct = (g: Int) => regexp_extract(ip, OctetPat, g)
    val nums = (1 to 4).map(g => oct(g).cast("long"))
    val valid = ip.rlike(OctetPat) &&
      nums.map(n => n <= 255).reduce(_ && _)
    when(valid,
      nums(0) * lit(16777216L) + nums(1) * lit(65536L) +
        nums(2) * lit(256L) + nums(3))
  }

  def ipv4ToNumSql(ip: String): String = {
    // TRY_CAST, not CAST (r20 ADVICE): DuckDB does not guarantee
    // short-circuit AND, so on a non-matching input the extract
    // yields '' and a plain CAST could hard-error where the Spark
    // face returns NULL; TRY_CAST makes unmatched rows NULL-safe
    val oct = (g: Int) =>
      s"TRY_CAST(regexp_extract($ip, '$OctetPat', $g) AS BIGINT)"
    val valid = s"regexp_matches($ip, '$OctetPat') AND " +
      (1 to 4).map(g => s"${oct(g)} <= 255").mkString(" AND ")
    s"""CASE WHEN $valid THEN
        ${oct(1)} * 16777216 + ${oct(2)} * 65536 + ${oct(3)} * 256 + ${oct(4)}
       END"""
  }

  /** Unsigned 32-bit BIGINT → dotted quad; null outside [0, 2³²). */
  def numToIpv4(n: Column): Column =
    when(n.isNotNull && n >= 0 && n <= lit(4294967295L),
      concat_ws(".",
        shiftright(n, 24).bitwiseAND(lit(255L)).cast("string"),
        shiftright(n, 16).bitwiseAND(lit(255L)).cast("string"),
        shiftright(n, 8).bitwiseAND(lit(255L)).cast("string"),
        n.bitwiseAND(lit(255L)).cast("string")))

  def numToIpv4Sql(n: String): String =
    s"""CASE WHEN $n IS NOT NULL AND $n >= 0 AND $n <= 4294967295 THEN
        CAST(($n >> 24) & 255 AS VARCHAR) || '.' ||
        CAST(($n >> 16) & 255 AS VARCHAR) || '.' ||
        CAST(($n >> 8) & 255 AS VARCHAR) || '.' ||
        CAST($n & 255 AS VARCHAR)
       END"""

  /** Shared CIDR literal parse + validation (r20 ADVICE: the SQL face
    * previously skipped the require()s, so a bad literal silently
    * generated wrong SQL — e.g. a negative shift — instead of failing
    * fast). Returns (prefixBits, baseNum).
    */
  private def parseCidr(cidr: String): (Int, Long) = {
    val Array(base, bitsS) = cidr.split("/")
    val bits = bitsS.toInt
    require(bits >= 0 && bits <= 32, s"prefix length out of range: $cidr")
    val parts = base.split("\\.").map(_.toLong)
    require(parts.length == 4 && parts.forall(p => p >= 0 && p <= 255),
      s"bad CIDR base: $cidr")
    (bits, parts(0) * 16777216L + parts(1) * 65536L +
      parts(2) * 256L + parts(3))
  }

  /** Membership of a numeric address in a LITERAL a.b.c.d/k block:
    * compare the top k bits. k = 0 matches everything.
    */
  def inCidr(ipNum: Column, cidr: String): Column = {
    val (bits, baseNum) = parseCidr(cidr)
    if (bits == 0) ipNum.isNotNull
    else shiftright(ipNum, 32 - bits) === lit(baseNum >> (32 - bits))
  }

  def inCidrSql(ipNum: String, cidr: String): String = {
    val (bits, baseNum) = parseCidr(cidr)
    if (bits == 0) s"$ipNum IS NOT NULL"
    else s"($ipNum >> ${32 - bits}) = ${baseNum >> (32 - bits)}"
  }
}
