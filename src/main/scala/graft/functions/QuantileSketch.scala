package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{coalesce, lit, udaf, udf}

/** Mergeable quantile state: the KLL sketch (Karnin, Lang & Liberty,
  * "Optimal Quantile Approximation in Streams", FOCS 2016) from
  * DataSketches — the same library Spark's own `hll_sketch_agg`
  * family ships. This is the quantile member of the
  * AggregatingMergeTree state algebra (ClickHouse
  * `quantilesState`/`quantilesMerge`): the reference's insert-latency
  * histogram (internal/metrics/metrics.go:18-24) maintained as an
  * incremental matview needs exactly this — a bounded, commutative,
  * mergeable per-key state whose merge is slice-invariant within
  * sketch tolerance, where A16's exact-percentile path would re-scan
  * raw history on every refresh.
  *
  * Shapes:
  *  - [[kllAgg]]: raw values → one serialized sketch per group (the
  *    partial-aggregation face; runs as partial+final with map-side
  *    combine like any Aggregator — state is O(k·log n) bytes per
  *    group on the shuffle, never the values);
  *  - [[kllMergeAgg]]: serialized sketches → their union (the
  *    replica/slice fan-in face);
  *  - [[kllQuantile]]: read-face estimate at a rank — evaluated over
  *    STATE rows (key cardinality), not data rows, so the scalar
  *    deserialize-per-row cost never touches the hot path.
  *
  * Error: a k=200 sketch bounds rank error at ~1.65% (99% conf.);
  * merges preserve the bound (mergeability is the KLL theorem, not a
  * heuristic). With fewer than k values buffered the sketch is exact.
  *
  * The aggregation buffer holds the LIVE heap sketch (updates are
  * O(1) amortized, no per-row serialization); the DataSketches binary
  * image travels only at shuffle/spill boundaries via the holder's
  * custom serialization, and is the stored state format — readable by
  * any DataSketches binding (the cross-engine contract HLL state
  * already relies on).
  */
object QuantileSketch {

  final class Holder(@transient var sk: KllDoublesSketch)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val b = sk.toByteArray
      out.writeInt(b.length)
      out.write(b)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      val n = in.readInt()
      val b = new Array[Byte](n)
      in.readFully(b)
      sk = KllDoublesSketch.heapify(Memory.wrap(b))
    }
  }

  /** Raw doubles → serialized KLL state. The call site encodes SQL
    * NULL as NaN (see [[kllAgg]]) so null rows are skipped exactly
    * like sum/min/max skip them.
    */
  class BuildAgg(k: Int) extends Aggregator[Double, Holder, Array[Byte]] {
    def zero: Holder = new Holder(KllDoublesSketch.newHeapInstance(k))
    def reduce(b: Holder, v: Double): Holder = {
      if (!v.isNaN) b.sk.update(v)
      b
    }
    def merge(a: Holder, b: Holder): Holder = { a.sk.merge(b.sk); a }
    def finish(b: Holder): Array[Byte] = b.sk.toByteArray
    def bufferEncoder: Encoder[Holder] = Encoders.javaSerialization[Holder]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Serialized KLL states → their union (null/empty states are
    * identity elements, so outer-join-shaped state unions fold
    * through without special casing).
    */
  class MergeAgg(k: Int) extends Aggregator[Array[Byte], Holder, Array[Byte]] {
    def zero: Holder = new Holder(KllDoublesSketch.newHeapInstance(k))
    def reduce(b: Holder, bytes: Array[Byte]): Holder = {
      if (bytes != null && bytes.nonEmpty)
        b.sk.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
      b
    }
    def merge(a: Holder, b: Holder): Holder = { a.sk.merge(b.sk); a }
    def finish(b: Holder): Array[Byte] = b.sk.toByteArray
    def bufferEncoder: Encoder[Holder] = Encoders.javaSerialization[Holder]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** quantilesState: aggregate raw `value` rows into one binary KLL
    * state per group. NULLs are skipped (encoded as NaN through the
    * non-nullable Double lane, filtered in reduce).
    */
  def kllAgg(value: Column, k: Int = 200): Column =
    udaf(new BuildAgg(k), Encoders.scalaDouble)(
      coalesce(value.cast("double"), lit(Double.NaN)))

  /** quantilesMerge: union binary KLL states into one. */
  def kllMergeAgg(state: Column, k: Int = 200): Column =
    udaf(new MergeAgg(k), Encoders.BINARY)(state)

  private val quantileUdf =
    udf { (bytes: Array[Byte], rank: Double) =>
      if (bytes == null || bytes.isEmpty) None
      else {
        val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
        if (sk.isEmpty) None else Some(sk.getQuantile(rank))
      }
    }

  /** Read-face estimate of the quantile at `rank` (0..1) from a
    * binary KLL state; null for an empty state. Runs over state rows
    * only — |keys| deserializations, never data-row work.
    */
  def kllQuantile(state: Column, rank: Double): Column =
    quantileUdf(state, lit(rank))
}
