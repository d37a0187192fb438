package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** X3 vector primitives over `ArrayType(FloatType)` embedding columns,
  * composed from higher-order functions (`zip_with`/`aggregate`) so the
  * whole dot product stays a single codegen'd expression — no UDF, no
  * serialization boundary, no MLlib dependency (SURVEY.md §2.10 X3).
  *
  * All arithmetic is promoted to double FIRST and accumulated in array
  * index order, so the floating-point result is deterministic and
  * reproducible by any engine that sums sequentially.
  */
object VectorFns {

  /** Sequential-order dot product of two float vectors in double —
    * the codegen'd native expression (see [[FloatDotProduct]]).
    */
  def dot(a: Column, b: Column): Column = VectorExprs.floatDot(a, b)

  /** Higher-order-function formulation, kept as the cross-check for
    * [[dot]] (identical accumulation order → bit-identical results)
    * and as the fallback shape other engines can mirror.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 for zero-norm vectors (never NaN/null on
    * well-formed input).
    */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm2(a) * norm2(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  /** SimHash-style signed random projection bucket for LSH over
    * cosine distance: the sign bit pattern of `planes` pseudo-random
    * hyperplanes. The "hyperplane" for (plane p, dim i) is a
    * deterministic ±1 derived from a hash — reproducible across runs
    * and engines, no stored model. Vectors in the same bucket are
    * near-duplicate CANDIDATES; callers verify with [[cosine]].
    *
    * 100 TB posture: this turns the quadratic all-pairs cosine into a
    * groupBy(bucket) shuffle + per-bucket pair join (X2-style), the
    * standard ANN scale path when no index structure is available.
    */
  def lshBucket(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      // deterministic ±1 per (plane, dim): parity of a cheap integer mix
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) => {
          val sign = when(pmod(hash(i.cast("int"), lit(p)), lit(2)) === 0, 1.0).otherwise(-1.0)
          x.cast("double") * sign
        }),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }
}
