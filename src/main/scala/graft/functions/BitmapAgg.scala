package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf
import org.roaringbitmap.longlong.Roaring64NavigableMap

/** Exact integer-id set algebra — the ClickHouse `groupBitmap` family
  * (`groupBitmapState` / `groupBitmapOr/And/Xor`, `bitmapCardinality`,
  * `bitmapAnd/Or/Andnot/Xor(+Cardinality)`, `bitmapMin/Max`,
  * `bitmapContains`, `bitmapToArray`): the EXACT complement of the
  * A18 theta-sketch states. Theta covers the sampling regime (bounded
  * state at any cardinality, ~1/sqrt(2^lgK) error); bitmaps are the
  * audience-segmentation production face for integer ids — exact
  * cardinalities and exact member recovery, state size proportional to
  * the id set's compressed form, not the row count.
  *
  * State format: Roaring64NavigableMap (64-bit Roaring, the same
  * container family ClickHouse's groupBitmap carries) in its native
  * UNSIGNED container order and portable byte layout (the portable
  * spec mandates unsigned key order, so a signed-comparator map does
  * not survive deserialization). Ids here are Spark BIGINTs, so the
  * min/max/toArray read faces impose SIGNED semantics on top: min/max
  * via rank/select around the 2^63 boundary, toArray re-sorted
  * signed. Shapes mirror [[ThetaSketch]]:
  *  - [[bitmapAgg]]: raw nullable longs → one serialized bitmap per
  *    group (partial+final with map-side combine; the shuffle carries
  *    the COMPRESSED bitmap, never the raw ids; NULLs skipped);
  *  - [[bitmapOrAgg]] / [[bitmapAndAgg]] / [[bitmapXorAgg]]: stored
  *    states → their union / intersection / symmetric difference
  *    (ClickHouse groupBitmapOr/And/Xor — matview re-merge faces);
  *  - scalar read faces over state rows: exact cardinalities of
  *    A, A∩B, A∪B, A\B, AΔB, plus min/max/contains/toArray.
  *
  * 100 TB posture: per-group state is bounded by the DISTINCT id set's
  * compressed size (runs + sparse containers), so a billion-user
  * audience is tens to hundreds of MB per segment — the reason CH
  * stores these as matview states. Partial aggregation ORs container
  * trees, never re-touches raw rows; the AND/XOR aggregates run over
  * already-built states (segment tables), which is the intended
  * production read: build once per segment slice, algebra at query
  * time.
  */
object BitmapAgg {

  /** Aggregation buffer: a live Roaring64NavigableMap; the serialized
    * portable image travels only at shuffle/spill boundaries.
    */
  final class Holder(@transient var m: Roaring64NavigableMap)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val b = BitmapAgg.toBytes(m)
      out.writeInt(b.length)
      out.write(b)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      val n = in.readInt()
      val b = new Array[Byte](n)
      in.readFully(b)
      m = BitmapAgg.fromBytes(b)
    }
  }

  private[graft] def toBytes(m: Roaring64NavigableMap): Array[Byte] = {
    m.runOptimize()
    val bos = new ByteArrayOutputStream()
    m.serializePortable(new DataOutputStream(bos))
    bos.toByteArray
  }

  private[graft] def fromBytes(b: Array[Byte]): Roaring64NavigableMap = {
    val m = new Roaring64NavigableMap()
    if (b != null && b.nonEmpty)
      m.deserializePortable(new DataInputStream(new ByteArrayInputStream(b)))
    m
  }

  /** groupBitmapState: raw nullable longs → serialized bitmap. */
  class BuildAgg extends Aggregator[java.lang.Long, Holder, Array[Byte]] {
    def zero: Holder = new Holder(new Roaring64NavigableMap())
    def reduce(b: Holder, v: java.lang.Long): Holder = {
      if (v != null) b.m.addLong(v)
      b
    }
    def merge(a: Holder, b: Holder): Holder = { a.m.or(b.m); a }
    def finish(b: Holder): Array[Byte] = toBytes(b.m)
    def bufferEncoder: Encoder[Holder] = Encoders.javaSerialization[Holder]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** groupBitmapOr over stored states (null/empty states are identity). */
  class OrAgg extends Aggregator[Array[Byte], Holder, Array[Byte]] {
    def zero: Holder = new Holder(new Roaring64NavigableMap())
    def reduce(b: Holder, bytes: Array[Byte]): Holder = {
      if (bytes != null && bytes.nonEmpty) b.m.or(fromBytes(bytes))
      b
    }
    def merge(a: Holder, b: Holder): Holder = { a.m.or(b.m); a }
    def finish(b: Holder): Array[Byte] = toBytes(b.m)
    def bufferEncoder: Encoder[Holder] = Encoders.javaSerialization[Holder]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Buffer for AND: `seen = false` is the identity element (AND has no
    * finite identity bitmap), so the first state REPLACES and later
    * states intersect — mirrored in merge. An input group with zero
    * non-null states finishes as the empty bitmap (the CH posture).
    */
  final class AndHolder(var seen: Boolean, var h: Holder) extends Serializable

  /** groupBitmapAnd over stored states. */
  class AndAgg extends Aggregator[Array[Byte], AndHolder, Array[Byte]] {
    def zero: AndHolder = new AndHolder(false, new Holder(new Roaring64NavigableMap()))
    def reduce(b: AndHolder, bytes: Array[Byte]): AndHolder = {
      if (bytes != null) {
        val m = fromBytes(bytes)
        if (!b.seen) { b.h.m = m; b.seen = true } else b.h.m.and(m)
      }
      b
    }
    def merge(a: AndHolder, b: AndHolder): AndHolder =
      if (!a.seen) b
      else if (!b.seen) a
      else { a.h.m.and(b.h.m); a }
    def finish(b: AndHolder): Array[Byte] = toBytes(b.h.m)
    def bufferEncoder: Encoder[AndHolder] = Encoders.javaSerialization[AndHolder]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** groupBitmapXor over stored states (symmetric difference fold —
    * order-free, so partial+final merging is safe).
    */
  class XorAgg extends Aggregator[Array[Byte], Holder, Array[Byte]] {
    def zero: Holder = new Holder(new Roaring64NavigableMap())
    def reduce(b: Holder, bytes: Array[Byte]): Holder = {
      if (bytes != null && bytes.nonEmpty) b.m.xor(fromBytes(bytes))
      b
    }
    def merge(a: Holder, b: Holder): Holder = { a.m.xor(b.m); a }
    def finish(b: Holder): Array[Byte] = toBytes(b.m)
    def bufferEncoder: Encoder[Holder] = Encoders.javaSerialization[Holder]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  import org.apache.spark.sql.functions.udaf

  /** groupBitmapState: aggregate raw nullable long ids into one
    * serialized bitmap per group.
    */
  def bitmapAgg(value: Column): Column =
    udaf(new BuildAgg, Encoders.LONG)(value)

  /** groupBitmapOr / And / Xor over stored states. */
  def bitmapOrAgg(state: Column): Column = udaf(new OrAgg, Encoders.BINARY)(state)
  def bitmapAndAgg(state: Column): Column = udaf(new AndAgg, Encoders.BINARY)(state)
  def bitmapXorAgg(state: Column): Column = udaf(new XorAgg, Encoders.BINARY)(state)

  // ---- scalar read faces over state rows -------------------------------

  private val cardUdf = udf { b: Array[Byte] => fromBytes(b).getLongCardinality }
  private val andCardUdf = udf { (a: Array[Byte], b: Array[Byte]) =>
    val m = fromBytes(a); m.and(fromBytes(b)); m.getLongCardinality
  }
  private val orCardUdf = udf { (a: Array[Byte], b: Array[Byte]) =>
    val m = fromBytes(a); m.or(fromBytes(b)); m.getLongCardinality
  }
  private val andnotCardUdf = udf { (a: Array[Byte], b: Array[Byte]) =>
    val m = fromBytes(a); m.andNot(fromBytes(b)); m.getLongCardinality
  }
  private val xorCardUdf = udf { (a: Array[Byte], b: Array[Byte]) =>
    val m = fromBytes(a); m.xor(fromBytes(b)); m.getLongCardinality
  }
  private val andUdf = udf { (a: Array[Byte], b: Array[Byte]) =>
    val m = fromBytes(a); m.and(fromBytes(b)); toBytes(m)
  }
  private val orUdf = udf { (a: Array[Byte], b: Array[Byte]) =>
    val m = fromBytes(a); m.or(fromBytes(b)); toBytes(m)
  }
  private val andnotUdf = udf { (a: Array[Byte], b: Array[Byte]) =>
    val m = fromBytes(a); m.andNot(fromBytes(b)); toBytes(m)
  }
  // unsigned element order puts [0, 2^63) first, then the negatives;
  // nonNeg = #elements in the non-negative prefix
  private def nonNegCount(m: Roaring64NavigableMap): Long =
    m.rankLong(java.lang.Long.MAX_VALUE)
  private val minUdf = udf { b: Array[Byte] =>
    val m = fromBytes(b)
    if (m.isEmpty) None
    else {
      val p = nonNegCount(m)
      // any negative (unsigned-largest block) is signed-smaller than
      // every non-negative; the unsigned-first negative is the signed min
      Some(if (p < m.getLongCardinality) m.select(p) else m.select(0L))
    }
  }
  private val maxUdf = udf { b: Array[Byte] =>
    val m = fromBytes(b)
    if (m.isEmpty) None
    else {
      val p = nonNegCount(m)
      Some(if (p > 0L) m.select(p - 1L) else m.select(m.getLongCardinality - 1L))
    }
  }
  private val containsUdf = udf { (b: Array[Byte], v: Long) =>
    fromBytes(b).contains(v)
  }
  private val toArrayUdf = udf { b: Array[Byte] =>
    val a = fromBytes(b).toArray
    java.util.Arrays.sort(a) // native order is unsigned; re-sort signed
    a
  }

  /** Exact |A| (bitmapCardinality). */
  def bitmapCardinality(state: Column): Column = cardUdf(state)

  /** Exact |A ∩ B| / |A ∪ B| / |A \ B| / |A Δ B| over two states. */
  def bitmapAndCardinality(a: Column, b: Column): Column = andCardUdf(a, b)
  def bitmapOrCardinality(a: Column, b: Column): Column = orCardUdf(a, b)
  def bitmapAndnotCardinality(a: Column, b: Column): Column = andnotCardUdf(a, b)
  def bitmapXorCardinality(a: Column, b: Column): Column = xorCardUdf(a, b)

  /** State-valued set ops (bitmapAnd / bitmapOr / bitmapAndnot). */
  def bitmapAnd(a: Column, b: Column): Column = andUdf(a, b)
  def bitmapOr(a: Column, b: Column): Column = orUdf(a, b)
  def bitmapAndnot(a: Column, b: Column): Column = andnotUdf(a, b)

  /** bitmapMin / bitmapMax (null on the empty bitmap — the engine-wide
    * null-not-sentinel posture; CH returns type-max/0 sentinels).
    */
  def bitmapMin(state: Column): Column = minUdf(state)
  def bitmapMax(state: Column): Column = maxUdf(state)

  /** bitmapContains. */
  def bitmapContains(state: Column, v: Column): Column = containsUdf(state, v)

  /** bitmapToArray — exact sorted member recovery (the face that makes
    * every other face value-oracle-able).
    */
  def bitmapToArray(state: Column): Column = toArrayUdf(state)
}
