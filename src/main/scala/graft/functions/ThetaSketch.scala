package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union}
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{lit, udaf, udf}

/** Theta-sketch distinct-count state with SET ALGEBRA — the
  * ClickHouse `uniqTheta` family (`uniqThetaUnion` /
  * `uniqThetaIntersect` / `uniqThetaNot`): the one thing the HLL
  * state the matview algebra already carries cannot do. An HLL union
  * is exact-shaped, but audience overlap ("users who did A AND B",
  * "users in cohort X but not Y") needs INTERSECTION and DIFFERENCE
  * over pre-aggregated states — with theta sketches those are
  * closed-form over the stored binaries (Dasgupta et al., "A Framework
  * for Estimating Stream Expression Cardinalities", EDBT 2016), so a
  * dashboard combines per-segment states without ever re-scanning raw
  * rows.
  *
  * Shapes mirror [[QuantileSketch]]:
  *  - [[thetaAgg]]: raw values → one serialized CompactSketch per
  *    group (partial+final with map-side combine; state is O(k)
  *    hashes on the shuffle, never the values; NULLs skipped);
  *  - [[thetaUnionAgg]]: serialized states → their union;
  *  - [[thetaEstimate]] / [[thetaIntersect]] / [[thetaDiff]]:
  *    read-face estimates over STATE rows (pairwise set ops take two
  *    state columns — per-segment sketches combined at query time).
  *
  * Exactness regime: a sketch with fewer than 2^lgK retained hashes
  * has never sampled, so estimates (and set-op results between such
  * sketches) are EXACT integers — the regime the registered query
  * runs in, which is what makes it value-oracle-able; the sampling
  * regime's relative-error bound (~1/sqrt(2^lgK)) is spec-tested.
  *
  * The aggregation buffer holds a live theta Union (raw updates hash
  * straight into it); the compact binary image travels only at
  * shuffle/spill boundaries and is the stored state format.
  */
object ThetaSketch {

  final class Holder(@transient var u: Union) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      val b = u.getResult.toByteArray
      out.writeInt(b.length)
      out.write(b)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      val n = in.readInt()
      val b = new Array[Byte](n)
      in.readFully(b)
      u = SetOperation.builder().buildUnion()
      u.union(CompactSketch.heapify(Memory.wrap(b)))
    }
  }

  private def newUnion(lgK: Int): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  /** Raw string values → serialized theta state; NULLs skipped. */
  class BuildAgg(lgK: Int) extends Aggregator[String, Holder, Array[Byte]] {
    def zero: Holder = new Holder(newUnion(lgK))
    def reduce(b: Holder, v: String): Holder = {
      if (v != null) b.u.update(v)
      b
    }
    def merge(a: Holder, b: Holder): Holder = {
      a.u.union(b.u.getResult)
      a
    }
    def finish(b: Holder): Array[Byte] = b.u.getResult.toByteArray
    def bufferEncoder: Encoder[Holder] = Encoders.javaSerialization[Holder]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Serialized theta states → their union (null states are
    * identity).
    */
  class UnionAgg(lgK: Int) extends Aggregator[Array[Byte], Holder, Array[Byte]] {
    def zero: Holder = new Holder(newUnion(lgK))
    def reduce(b: Holder, bytes: Array[Byte]): Holder = {
      if (bytes != null && bytes.nonEmpty)
        b.u.union(CompactSketch.heapify(Memory.wrap(bytes)))
      b
    }
    def merge(a: Holder, b: Holder): Holder = {
      a.u.union(b.u.getResult)
      a
    }
    def finish(b: Holder): Array[Byte] = b.u.getResult.toByteArray
    def bufferEncoder: Encoder[Holder] = Encoders.javaSerialization[Holder]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** uniqThetaState: aggregate raw `value` strings into one binary
    * theta state per group.
    */
  def thetaAgg(value: Column, lgK: Int = 12): Column =
    udaf(new BuildAgg(lgK), Encoders.STRING)(value)

  /** uniqThetaUnion over stored states. */
  def thetaUnionAgg(state: Column, lgK: Int = 12): Column =
    udaf(new UnionAgg(lgK), Encoders.BINARY)(state)

  private def sk(bytes: Array[Byte]): CompactSketch =
    CompactSketch.heapify(Memory.wrap(bytes))

  private val estimateUdf = udf { bytes: Array[Byte] =>
    if (bytes == null || bytes.isEmpty) 0.0 else sk(bytes).getEstimate
  }
  private val intersectUdf = udf { (a: Array[Byte], b: Array[Byte]) =>
    if (a == null || a.isEmpty || b == null || b.isEmpty) 0.0
    else {
      val op = SetOperation.builder().buildIntersection()
      op.intersect(sk(a))
      op.intersect(sk(b))
      op.getResult.getEstimate
    }
  }
  private val diffUdf = udf { (a: Array[Byte], b: Array[Byte]) =>
    if (a == null || a.isEmpty) 0.0
    else if (b == null || b.isEmpty) sk(a).getEstimate
    else Sketches.setOperationBuilder().buildANotB()
      .aNotB(sk(a), sk(b)).getEstimate
  }

  /** |A| estimate from a state (0 for null/empty). */
  def thetaEstimate(state: Column): Column = estimateUdf(state)

  /** |A ∩ B| estimate from two states (uniqThetaIntersect). */
  def thetaIntersect(a: Column, b: Column): Column = intersectUdf(a, b)

  /** |A \ B| estimate from two states (uniqThetaNot). */
  def thetaDiff(a: Column, b: Column): Column = diffUdf(a, b)
}
