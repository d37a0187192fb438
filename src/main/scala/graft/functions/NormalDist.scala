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

  /** One-sided upper-tail p = 1 − Φ(z), round-6; null passes through.
    * Negative z routes through symmetry (1 − upperTail(−z)) so the
    * polynomial always sees a non-negative argument.
    */
  def upperP(z: Column): Column =
    when(z.isNotNull, round(
      when(z >= 0, upperTail(z))
        .otherwise(lit(1.0) - upperTail(-z)), 6))

  /** χ²(df) upper-tail p-value via the Wilson–Hilferty (1931) normal
    * approximation — the cube-root transform
    * ((x/k)^(1/3) − (1 − 2/(9k))) / sqrt(2/(9k)) is approximately
    * standard normal, so the chi-squared family (Kruskal–Wallis,
    * Friedman, Jarque–Bera) gets p-values through the SAME Φ tree
    * the z family uses. Both engines have cbrt; same round-6
    * discipline. Accuracy a few 1e-3 absolute at small df (worst
    * spec-anchored points: 2.8e-3 at k = 1, 2.3e-3 at k = 2) — a
    * p_approx, and named as such. Null x passes through; requires
    * k ≥ 1.
    */
  def chiSqUpperP(x: Column, k: Column): Column = {
    val kd = k.cast("double")
    val z = (cbrt(x / kd) - (lit(1.0) - lit(2.0) / (lit(9.0) * kd))) /
      sqrt(lit(2.0) / (lit(9.0) * kd))
    when(x.isNotNull && k.isNotNull && kd >= lit(1.0), upperP(z))
  }

  /** F(d1, d2) upper-tail p-value via the Paulson (1942) normal
    * approximation (A&S 26.6.15) — the two-sided Wilson–Hilferty:
    *
    *   z = ((1 − 2/(9·d2))·F^(1/3) − (1 − 2/(9·d1)))
    *       / sqrt(2/(9·d1) + F^(2/3)·2/(9·d2))
    *
    * Serves the ANOVA F directly and the t family through the exact
    * identity P(|T_ν| > t) = P(F₁,ν > t²). Accuracy ~1e-3 at d1 ≥ 2;
    * ≲3e-3 at d1 = 1 (the W–H k = 1 weakness — spec-anchored) — a
    * p_approx. Null f passes through; requires d1, d2 ≥ 1.
    */
  def fUpperP(f: Column, d1: Column, d2: Column): Column = {
    val a = d1.cast("double")
    val b = d2.cast("double")
    val c = cbrt(f)
    val z = ((lit(1.0) - lit(2.0) / (lit(9.0) * b)) * c -
      (lit(1.0) - lit(2.0) / (lit(9.0) * a))) /
      sqrt(lit(2.0) / (lit(9.0) * a) + c * c * (lit(2.0) / (lit(9.0) * b)))
    when(f.isNotNull && d1.isNotNull && d2.isNotNull &&
      a >= lit(1.0) && b >= lit(1.0), upperP(z))
  }

  /** SQL mirror of [[fUpperP]] — identical literals and operation
    * order. `f`, `d1`, `d2` are SQL expression strings, atomic.
    */
  def fUpperPSql(f: String, d1: String, d2: String): String = {
    val a = s"CAST($d1 AS DOUBLE)"
    val b = s"CAST($d2 AS DOUBLE)"
    val z = s"(((1.0 - 2.0 / (9.0 * $b)) * cbrt($f) " +
      s"- (1.0 - 2.0 / (9.0 * $a))) " +
      s"/ sqrt(2.0 / (9.0 * $a) + cbrt($f) * cbrt($f) " +
      s"* (2.0 / (9.0 * $b))))"
    val xx = s"(CASE WHEN $z >= 0 THEN $z ELSE -$z END)"
    val t = s"(1.0 / (1.0 + $P * $xx))"
    val poly = s"($t * ($B1 + $t * ($B2 + $t * ($B3 + $t * ($B4 + $t * $B5)))))"
    val ut = s"(exp(-($xx * $xx) / 2.0) * $INV_SQRT_2PI * $poly)"
    s"CASE WHEN $f IS NOT NULL AND $d1 IS NOT NULL AND $d2 IS NOT NULL " +
      s"AND $a >= 1.0 AND $b >= 1.0 THEN " +
      s"round(CASE WHEN $z >= 0 THEN $ut ELSE 1.0 - $ut END, 6) END"
  }

  /** Kolmogorov distribution tail Q_KS(λ) = P(sup|B| > λ) — the KS
    * test's asymptotic p-value. The alternating series
    * 2·Σ(−1)^{k−1}·exp(−2k²λ²) converges fast for large λ but needs
    * many terms for small λ, so this uses the standard two-regime
    * fixed tree (the Jacobi theta-function dual — both forms are
    * textbook/Numerical-Recipes-standard):
    *
    *   λ <  1.18: p = 1 − √(2π)/λ · (e^{−π²/(8λ²)}
    *                + e^{−9π²/(8λ²)} + e^{−25π²/(8λ²)})
    *   λ ≥ 1.18: p = 2·(e^{−2λ²} − e^{−8λ²} + e^{−18λ²})
    *
    * Three terms bound the truncation error below 1e-8 on each side
    * of the 1.18 crossover. Round-6; null λ passes through; λ ≤ 0
    * clamps to p = 1.
    */
  def ksP(lambda: Column): Column = {
    val l2 = lambda * lambda
    val small = lit(1.0) - lit(2.5066282746310002) / lambda *
      (exp(lit(-1.233700550136170) / l2) +
        exp(lit(-11.10330495122553) / l2) +
        exp(lit(-30.84251375340425) / l2))
    val large = lit(2.0) * (exp(lit(-2.0) * l2) -
      exp(lit(-8.0) * l2) + exp(lit(-18.0) * l2))
    when(lambda.isNotNull, round(
      when(lambda <= lit(0.0), lit(1.0))
        .when(lambda < lit(1.18), greatest(lit(0.0), least(lit(1.0), small)))
        .otherwise(large), 6))
  }

  /** SQL mirror of [[ksP]] — identical literals and operation order.
    * `lambda` is a SQL expression string, atomic.
    */
  def ksPSql(lambda: String): String = {
    val l2 = s"($lambda * $lambda)"
    val small = s"(1.0 - 2.5066282746310002 / $lambda * " +
      s"(exp(-1.233700550136170 / $l2) + exp(-11.10330495122553 / $l2) " +
      s"+ exp(-30.84251375340425 / $l2)))"
    val large = s"(2.0 * (exp(-2.0 * $l2) - exp(-8.0 * $l2) " +
      s"+ exp(-18.0 * $l2)))"
    s"CASE WHEN $lambda IS NOT NULL THEN round(CASE " +
      s"WHEN $lambda <= 0.0 THEN 1.0 " +
      s"WHEN $lambda < 1.18 THEN greatest(0.0, least(1.0, $small)) " +
      s"ELSE $large END, 6) END"
  }

  /** SQL mirror of [[chiSqUpperP]] — identical literals and operation
    * order. `x` and `k` are SQL expression strings, atomic.
    */
  def chiSqUpperPSql(x: String, k: String): String = {
    val kd = s"CAST($k AS DOUBLE)"
    val z = s"((cbrt($x / $kd) - (1.0 - 2.0 / (9.0 * $kd))) " +
      s"/ sqrt(2.0 / (9.0 * $kd)))"
    val xx = s"(CASE WHEN $z >= 0 THEN $z ELSE -$z END)"
    val t = s"(1.0 / (1.0 + $P * $xx))"
    val poly = s"($t * ($B1 + $t * ($B2 + $t * ($B3 + $t * ($B4 + $t * $B5)))))"
    val ut = s"(exp(-($xx * $xx) / 2.0) * $INV_SQRT_2PI * $poly)"
    s"CASE WHEN $x IS NOT NULL AND $k IS NOT NULL AND $kd >= 1.0 THEN " +
      s"round(CASE WHEN $z >= 0 THEN $ut ELSE 1.0 - $ut END, 6) END"
  }
}
