package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Standard-normal CDF and two-sided p-values as ONE fixed expression
  * tree, mirrored verbatim into ANSI SQL for the DuckDB oracles.
  *
  * Neither Spark SQL nor DuckDB exposes `erf`, so Φ is computed from
  * the Abramowitz & Stegun 26.2.17 (Zelen & Severo) polynomial
  * approximation — |ε| < 7.5e−8, far inside the round-6 reporting
  * grid:
  *
  *   t    = 1 / (1 + 0.2316419·x)            (x = |z| ≥ 0)
  *   φ(x) = exp(−x²/2) / √(2π)
  *   Φ(x) ≈ 1 − φ(x)·t·(b1 + t·(b2 + t·(b3 + t·(b4 + t·b5))))
  *
  * Cross-engine discipline (the round-9/round-6 convention used
  * throughout the stats panel): the approximation error is IDENTICAL
  * on both sides because both run the SAME double tree — only
  * exp()'s last ulp can differ between java.lang.Math and std::exp,
  * and the final round-6 absorbs it exactly as the existing
  * entropy/PSI oracles absorb ln(). Callers feed the ROUNDED
  * round-6 z they already report, so the p-value's parity rests on a
  * value the driver gate has ALREADY proven bit-identical.
  *
  * Reference engine behavior: ClickHouse's mannWhitneyUTest /
  * meanZTest return (stat, p-value) tuples; the panel's p-value
  * columns (reference `go-otel-clickhouse-ingestor` surfaces the
  * stats family through its query layer) complete that read face.
  */
object NormalDist {

  // A&S 26.2.17 constants — written once; the SQL mirror must use the
  // exact same literals so both engines parse identical doubles
  private val P = "0.2316419"
  private val B1 = "0.319381530"
  private val B2 = "-0.356563782"
  private val B3 = "1.781477937"
  private val B4 = "-1.821255978"
  private val B5 = "1.330274429"
  private val INV_SQRT_2PI = "0.3989422804014327" // 1/√(2π)

  /** Upper-tail mass 1 − Φ(x) for x ≥ 0 (callers pass |z|). */
  private def upperTail(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(P.toDouble) * x)
    val poly = t * (lit(B1.toDouble) + t * (lit(B2.toDouble) +
      t * (lit(B3.toDouble) + t * (lit(B4.toDouble) +
        t * lit(B5.toDouble)))))
    exp(-(x * x) / lit(2.0)) * lit(INV_SQRT_2PI.toDouble) * poly
  }

  /** Φ(z) for any real z, via symmetry Φ(−x) = 1 − Φ(x). Round-6. */
  def cdf(z: Column): Column = {
    val u = upperTail(abs(z))
    round(when(z >= 0, lit(1.0) - u).otherwise(u), 6)
  }

  /** Two-sided normal p-value 2·(1 − Φ(|z|)), round-6; null passes
    * through (a null z means the test itself was degenerate).
    */
  def twoSidedP(z: Column): Column =
    when(z.isNotNull, round(lit(2.0) * upperTail(abs(z)), 6))

  /** The EXACT SQL mirror of [[twoSidedP]] — same literals, same
    * operation order — for splicing into a DuckDB oracle. `z` is a
    * SQL expression string assumed already parenthesized/atomic.
    */
  def twoSidedPSql(z: String): String = {
    val x = s"abs($z)"
    val t = s"(1.0 / (1.0 + $P * $x))"
    val poly = s"($t * ($B1 + $t * ($B2 + $t * ($B3 + $t * ($B4 + $t * $B5)))))"
    s"CASE WHEN $z IS NOT NULL THEN " +
      s"round(2.0 * (exp(-($x * $x) / 2.0) * $INV_SQRT_2PI * $poly), 6) END"
  }
}
