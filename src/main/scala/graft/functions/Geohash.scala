package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F18 — geohash encode/decode as pure codegen column trees, the
  * ClickHouse `geohashEncode` / `geohashDecode` surface next to F17's
  * distance/polygon pair.
  *
  * A geohash is the base-32 rendering of the Morton (Z-order)
  * interleave of binary-subdivided longitude and latitude — exactly
  * the bit machinery [[graft.sources.Layout]] already ships for L3
  * z-ordered writes, re-based onto the fixed geographic domain
  * (lon ∈ [−180, 180), lat ∈ [−90, 90)) and rendered through the
  * geohash alphabet (base 32, 'a'/'i'/'l'/'o' omitted). The first
  * (most significant) bit of the code is a LONGITUDE bit, so with
  * [[graft.sources.Layout.mortonCode]]'s convention (x = even bits,
  * y = odd bits) latitude rides x and longitude rides y.
  *
  * Precision ladder: an even precision P uses 5P/2 bits per
  * dimension; quantizing ONCE at the finest supported precision
  * (P = 6 → 15 bits/dim, inside [[graft.sources.Layout.spreadBits16]]'s
  * 16-bit domain) and right-shifting yields every coarser code, which
  * is why geohashes truncate: gh4 is literally the first 4 chars of
  * gh6 (floor(v·2¹⁰) = floor(v·2¹⁵) >> 5 — the floor-composition
  * law, spec-asserted).
  *
  * Cross-engine posture: quantization is ONE fixed double tree
  * ((v + off) / span · 2¹⁵, floored) — identical IEEE op sequence on
  * both engines, then everything downstream is integer shift/and/or
  * on longs. Decode maps chars back through an ascii-arithmetic CASE
  * (no table lookups), un-interleaves with the inverse magic-mask
  * chain, and reports the CELL CENTER ((bits + 0.5)/2¹⁵-scaled).
  * Both the Column trees and the oracle SQL fragments are generated
  * from the same mask/shift/alphabet literals below — the F17
  * generator discipline, so the engines cannot drift.
  */
object Geohash {

  /** The geohash base-32 alphabet (public standard: digits then
    * lowercase consonant-ish letters, skipping a, i, l, o).
    */
  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Bits per dimension at the finest supported precision (P = 6:
    * 30 code bits = 15 per dimension).
    */
  val MaxBitsPerDim = 15

  /** The spread-bits magic masks — ONE literal list for every
    * generator in this module (staged SQL, inline SQL; mirrors
    * [[graft.sources.Layout.spreadBits16]]'s chain, parity pinned by
    * GeohashSpec's bisection-reference test; r20 review finding:
    * three copies invited drift).
    */
  val SpreadMasks: Seq[(Long, Int)] = Seq(
    (0x00FF00FFL, 8), (0x0F0F0F0FL, 4), (0x33333333L, 2), (0x55555555L, 1))

  /** Exact quantization of a coordinate onto [0, 2¹⁵): floor((v − lo)
    * / span · 2¹⁵) clamped to the domain — the clamp only ever fires
    * on v = lo + span exactly (the right edge, e.g. lat = +90).
    */
  def quantize15(v: Column, lo: Double, span: Double): Column =
    quantizeN(v, lo, span, MaxBitsPerDim)

  /** The same quantization as a DuckDB SQL fragment (DuckDB's floor
    * returns DOUBLE, hence the explicit BIGINT cast — same value for
    * anything inside 2⁵³).
    */
  def quantize15Sql(v: String, lo: Double, span: Double): String =
    quantizeNSql(v, lo, span, MaxBitsPerDim)

  /** Base-32 rendering of the top `chars` 5-bit groups of a
    * 5·chars-bit code.
    */
  def base32(code: Column, chars: Int): Column =
    concat((0 until chars).map { i =>
      val shift = 5 * (chars - 1 - i)
      lit(Alphabet).substr(
        (shiftright(code, shift).bitwiseAND(lit(31L)).cast("int") + lit(1)),
        lit(1))
    }: _*)

  /** The same base-32 rendering as SQL over a code-column name. */
  def base32Sql(code: String, chars: Int): String =
    (0 until chars).map { i =>
      val shift = 5 * (chars - 1 - i)
      s"substr('$Alphabet', CAST((($code >> $shift) & 31) AS INTEGER) + 1, 1)"
    }.mkString("concat(", ", ", ")")

  /** Alphabet index of a single geohash char via ascii arithmetic —
    * the alphabet's three letter gaps (a, i/l/o skipped) make the
    * index a 5-branch CASE on the code point, no lookup table:
    * '0'..'9' → 0..9, 'b'..'h' → 10..16, 'j','k' → 17,18,
    * 'm','n' → 19,20, 'p'..'z' → 21..31.
    */
  def charIdx(c: Column): Column = {
    val a = ascii(c).cast("long")
    when(a <= 57, a - 48)
      .when(a <= 104, a - 88)
      .when(a <= 107, a - 89)
      .when(a <= 110, a - 90)
      .otherwise(a - 91)
  }

  /** The same char-index CASE as SQL over a char expression. */
  def charIdxSql(c: String): String =
    s"""CASE WHEN ascii($c) <= 57 THEN ascii($c) - 48
        WHEN ascii($c) <= 104 THEN ascii($c) - 88
        WHEN ascii($c) <= 107 THEN ascii($c) - 89
        WHEN ascii($c) <= 110 THEN ascii($c) - 90
        ELSE ascii($c) - 91 END"""

  /** Reassemble the integer code from a geohash string of `chars`
    * characters (the inverse of [[base32]]).
    */
  def codeOf(gh: Column, chars: Int): Column =
    (0 until chars).map { i =>
      shiftleft(charIdx(gh.substr(i + 1, 1)), 5 * (chars - 1 - i))
    }.reduce(_ + _)

  /** The same reassembly as SQL. */
  def codeOfSql(gh: String, chars: Int): String =
    (0 until chars).map { i =>
      s"((${charIdxSql(s"substr($gh, ${i + 1}, 1)")}) << ${5 * (chars - 1 - i)})"
    }.mkString("(", " + ", ")")

  /** The forward spread-bits chain as staged SQL select items —
    * mirrors [[graft.sources.Layout.spreadBits16]]'s mask/shift
    * literals exactly (the q_zorder oracle writes the same chain);
    * each returned item is one CTE stage (`expr AS prefixN`), since
    * every stage references its input twice.
    */
  def spreadSqlStages(x: String, prefix: String): Seq[String] = {
    val s0 = s"($x & 65535) AS ${prefix}0"
    val rest = SpreadMasks.zipWithIndex.map { case ((mask, sh), i) =>
      s"((${prefix}$i | (${prefix}$i << $sh)) & $mask) AS ${prefix}${i + 1}"
    }
    s0 +: rest
  }

  /** Inverse spread: compact the EVEN bits of a ≤32-bit value into
    * the low 16 — the reverse of [[graft.sources.Layout.spreadBits16]]'s
    * magic-mask chain. Shared literals with [[compactEvenSqlStages]].
    */
  val CompactStages: Seq[(Long, Int)] = Seq(
    (0x33333333L, 1), (0x0F0F0F0FL, 2), (0x00FF00FFL, 4), (0x0000FFFFL, 8))

  def compactEven(x: Column): Column =
    CompactStages.foldLeft(x.bitwiseAND(lit(0x55555555L))) {
      case (acc, (mask, sh)) =>
        acc.bitwiseOR(shiftright(acc, sh)).bitwiseAND(lit(mask))
    }

  /** The compact chain as staged SQL: returns (stageSelects, finalCol)
    * where each stage is `expr AS name` to ride a CTE ladder — inlining
    * would duplicate the input expression 2⁴ times (each stage
    * references its input twice).
    */
  def compactEvenSqlStages(x: String, prefix: String): Seq[String] = {
    val s0 = s"($x & ${0x55555555L}) AS ${prefix}0"
    val rest = CompactStages.zipWithIndex.map { case ((mask, sh), i) =>
      s"((${prefix}$i | (${prefix}$i >> $sh)) & $mask) AS ${prefix}${i + 1}"
    }
    s0 +: rest
  }

  /** Quantization onto [0, 2^bits) at an arbitrary per-dimension bit
    * width (the [[quantize15]] tree generalized — used by the
    * box-cover face at coarser precisions).
    */
  def quantizeN(v: Column, lo: Double, span: Double, bits: Int): Column =
    least(greatest(
      floor((v - lit(lo)) / lit(span) * lit(math.pow(2.0, bits)))
        .cast("long"),
      lit(0L)), lit((1L << bits) - 1))

  def quantizeNSql(v: String, lo: Double, span: Double, bits: Int): String =
    s"least(greatest(CAST(floor(($v - $lo) / $span * ${math.pow(2.0, bits)}) AS BIGINT), 0), ${(1L << bits) - 1})"

  /** The spread-bits chain INLINE over a leaf variable (safe to nest:
    * the duplicated references are to one token, not a subtree) — the
    * SQL twin of [[graft.sources.Layout.spreadBits16]] for use inside
    * list lambdas where CTE staging is unavailable.
    */
  def spreadInlineSql(v: String): String =
    SpreadMasks.foldLeft(s"($v & 65535)") { case (acc, (mask, sh)) =>
      s"(($acc | ($acc << $sh)) & $mask)"
    }

  /** F18c — all geohashes of an EVEN `precision` covering the
    * [latMin, latMax] × [lonMin, lonMax] box (clamped to the globe;
    * no antimeridian wrap — split a wrapping box into two calls), as
    * a SORTED comma-joined string (the flat-scalar gate contract).
    * Entirely map-side: the cell ranges are integer quantizations of
    * the box corners and the cover is a nested sequence-transform —
    * no explode, no shuffle; the ClickHouse `geohashesInBox` surface.
    */
  def geohashesInBox(latMin: Column, latMax: Column, lonMin: Column,
      lonMax: Column, precision: Int): Column = {
    require(precision % 2 == 0 && precision >= 2 && precision <= 6,
      s"even precision in [2,6]: $precision")
    val bits = 5 * precision / 2
    val yLo = quantizeN(latMin, -90.0, 180.0, bits)
    val yHi = quantizeN(latMax, -90.0, 180.0, bits)
    val xLo = quantizeN(lonMin, -180.0, 360.0, bits)
    val xHi = quantizeN(lonMax, -180.0, 360.0, bits)
    // the interleave is width-agnostic: spread of `bits`-wide halves
    // IS the 2·bits-wide geohash code (lat even, lon odd)
    val cells = flatten(transform(sequence(yLo, yHi), y =>
      transform(sequence(xLo, xHi), x =>
        base32(graft.sources.Layout.mortonCode(y, x), precision))))
    array_join(array_sort(cells), ",")
  }

  def geohashesInBoxSql(latMin: String, latMax: String, lonMin: String,
      lonMax: String, precision: Int): String = {
    require(precision % 2 == 0 && precision >= 2 && precision <= 6)
    val bits = 5 * precision / 2
    val code = s"(${spreadInlineSql("y")} | (${spreadInlineSql("x")} << 1))"
    s"""array_to_string(list_sort(flatten(list_transform(
        generate_series(${quantizeNSql(latMin, -90.0, 180.0, bits)},
          ${quantizeNSql(latMax, -90.0, 180.0, bits)}),
        y -> list_transform(
          generate_series(${quantizeNSql(lonMin, -180.0, 360.0, bits)},
            ${quantizeNSql(lonMax, -180.0, 360.0, bits)}),
          x -> ${base32Sql(code, precision)})))), ',')"""
  }

  /** Cell-center coordinate from compacted bits at the full 15-bit
    * resolution shifted down to `bits`: (b + 0.5) / 2^bits · span + lo.
    */
  def cellCenter(bitsCol: Column, bits: Int, lo: Double, span: Double): Column =
    round((bitsCol.cast("double") + lit(0.5)) / lit(math.pow(2.0, bits)) *
      lit(span) + lit(lo), 6)

  def cellCenterSql(bitsCol: String, bits: Int, lo: Double, span: Double): String =
    s"round((CAST($bitsCol AS DOUBLE) + 0.5) / ${math.pow(2.0, bits)} * $span + $lo, 6)"
}
