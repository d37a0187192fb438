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

  /** Deterministic ±1 hyperplane for signed-random-projection LSH:
    * sign(table t, plane p, dim i) = +1 iff the low bit of the first
    * md5("t:p:i") byte is 0. Pure constants — computed once
    * driver-side and shipped as LITERAL arrays into both the Spark
    * plan and the DuckDB oracle text, so the bucket function is
    * bit-identically reproducible in any engine (no engine-private
    * hash in the data path).
    */
  def planeSigns(table: Int, plane: Int, dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { i =>
      val b = md.digest(s"$table:$plane:$i".getBytes("UTF-8"))(0)
      if ((b & 1) == 0) 1.0f else -1.0f
    }
  }

  /** Signed-random-projection bucket for LSH over cosine distance:
    * the sign-bit pattern of `planes` deterministic ±1 hyperplanes
    * (table index picks an independent hyperplane family for
    * OR-amplification). Each projection is a codegen'd
    * [[FloatDotProduct]] against a literal sign vector — no
    * interpreted lambda in the per-row path. Vectors in the same
    * bucket are near-duplicate CANDIDATES; callers verify with
    * [[cosine]].
    *
    * 100 TB posture: this turns the quadratic all-pairs cosine into a
    * shuffle partitioned by (table, bucket) + per-bucket pair join
    * (X2-style), the standard ANN scale path when no index structure
    * is available. `planes` dials bucket granularity (2^planes
    * buckets/table); more tables buy candidate recall at linear cost.
    */
  def lshBucket(vec: Column, table: Int, planes: Int, dim: Int): Column = {
    val bits = (0 until planes).map { p =>
      val signs = typedLit(planeSigns(table, p, dim).toSeq)
      when(VectorExprs.floatDot(vec, signs) >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }
}
