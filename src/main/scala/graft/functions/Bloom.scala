package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A Bloom filter whose PROBE side is pure Catalyst built-ins — no
  * UDF, no serialization boundary, the membership test stays inside
  * whole-stage codegen: `xxhash64` double hashing
  * (Kirsch–Mitzenmacher, the same scheme the MinHash signatures use)
  * indexes a bitmap carried as ONE array<long> literal in the plan
  * (a single ArrayData constant — codegen references it, it is never
  * unrolled), and `getbit` + `element_at` test the k bits.
  *
  * The BUILD side collects the member set's two xxhash64 values to
  * the driver — bounded by the member-set size, which is the same
  * "small side" assumption a broadcast join makes (the caller is
  * choosing a Bloom filter precisely because the set is small
  * relative to the stream being probed). Both sides compute the
  * hashes with the same engine expression, so build and probe agree
  * bit-for-bit by construction.
  *
  * No false negatives ever; false-positive rate ≈ (1 − e^{−kn/m})^k —
  * with the auto-sized m = next-pow-2(10·n) and k = 3, under 2%.
  * Exactness-critical callers follow the filter with a verify join
  * (candidates-then-verify, like every sketch path in this library).
  */
object Bloom {

  /** Built bitmap + the dials the probe needs. `bits` is a power of
    * two so pmod is cheap and stable.
    */
  final case class Filter(words: Seq[Long], bits: Long, k: Int)

  private def h1(c: Column): Column = xxhash64(c)
  private def h2(c: Column): Column = xxhash64(c, lit(1L))

  /** Build a filter over the DISTINCT values of `value` in `df`.
    * `bitsPerItem` ≈ 10 and k = 3 give < 2% FP; bits auto-sizes to
    * the next power of two of bitsPerItem·n, clamped to [2^16, 2^26]
    * (8 KB – 8 MB of plan constant).
    */
  /** Driver-side guard on the collected member set, mirroring
    * `spark.sql.autoBroadcastJoinThreshold`'s role for broadcast
    * joins: fail fast with a clear message instead of a driver OOM
    * when a caller passes a "benchmark" side that isn't small. 32 M
    * distinct members ≈ 512 MB of collected hash pairs — already past
    * the point where the bitmap (capped at 8 MB) saturates and the
    * filter is pure FP noise, so the cap costs no legitimate caller.
    */
  val defaultMaxMembers: Long = 32L * 1024 * 1024

  def build(df: DataFrame, value: Column, bitsPerItem: Int = 10,
      k: Int = 3, maxMembers: Long = defaultMaxMembers): Filter = {
    // guard WITHOUT a second aggregate job: collect through a
    // cap+1-row limit, so driver memory is bounded by the cap itself
    // (the documented budget) and an oversized build side surfaces as
    // a clear error, never an unbounded collect — a separate count()
    // probe would double the build's scan work (measured: it did)
    val cap = math.min(maxMembers, Int.MaxValue - 2L).toInt
    val hashes = df.select(h1(value).as("h1"), h2(value).as("h2"))
      .distinct().limit(cap + 1).collect()
    require(hashes.length <= cap,
      s"Bloom.build: member set exceeds the $maxMembers-distinct cap — " +
        "the build side must be small (it is collected to the driver, " +
        "like a broadcast join's small side); raise maxMembers only if " +
        "the driver has the heap for it")
    val n = math.max(1L, hashes.length.toLong)
    val bits = math.min(1L << 26,
      math.max(1L << 16, java.lang.Long.highestOneBit(bitsPerItem * n) * 2))
    val words = new Array[Long]((bits / 64).toInt)
    hashes.foreach { r =>
      // reduce both hashes mod bits BEFORE combining: i*b2 + b1 stays
      // far under Long.MaxValue, so build (Scala) and probe (Catalyst
      // under ANSI, which forbids wrapping) compute identical indexes
      val b1 = ((r.getLong(0) % bits) + bits) % bits
      val b2 = ((r.getLong(1) % bits) + bits) % bits
      var i = 0
      while (i < k) {
        val idx = (b1 + i.toLong * b2) % bits
        words((idx >> 6).toInt) |= 1L << (idx & 63)
        i += 1
      }
    }
    Filter(words.toSeq, bits, k)
  }

  /** Membership test as a boolean Column — k getbit probes ANDed,
    * all built-ins, codegen-friendly. True for every built value
    * (no false negatives); true for ~FP% of non-members.
    */
  def mightContain(f: Filter, value: Column): Column = {
    val bitmap = typedlit(f.words)
    val (a, b) = (pmod(h1(value), lit(f.bits)), pmod(h2(value), lit(f.bits)))
    (0 until f.k).map { i =>
      val idx = pmod(a + lit(i.toLong) * b, lit(f.bits))
      call_function("getbit",
        element_at(bitmap, shiftright(idx, 6).cast("int") + 1),
        pmod(idx, lit(64L)).cast("int")) === 1
    }.reduce(_ && _)
  }
}
