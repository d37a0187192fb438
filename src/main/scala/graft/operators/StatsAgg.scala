package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical aggregates over the ingested tables — the ClickHouse
  * `entropy` / `cramersV` / `boundingRatio` family (public ClickHouse
  * SQL surface; the analytics layer over the events the reference
  * lands via `internal/ingestion/clickhouse.go:74-96`). Completes the
  * A17 corr/regr statistics row with the categorical-association and
  * distribution-shape members.
  *
  * Determinism discipline (the A17/X13 convention): every input to a
  * floating-point expression is an EXACT integer count (category
  * counts, margins, n), each per-category double term is computed by
  * one fixed IEEE expression tree, rounded to 9 places and summed as
  * DECIMAL — so the only order-sensitive step (double addition) is
  * replaced by an order-free exact sum, and the final statistic is
  * bit-identical in any engine implementing the same formula.
  *
  * Scale shape: everything reduces to (keys, category) partial+final
  * count aggregates first — raw volume reaches one shuffle, once, and
  * every later stage (margins, terms, final fold) runs over
  * category-cardinality rows, never rows of the input.
  */
object StatsAgg {

  /** Shannon entropy (bits) of `value`'s distribution per key:
    * H = log2(n) − (Σ c·log2 c)/n over category counts c — the
    * count-only rewrite of −Σ p·log2 p (every term positive, no
    * division inside the sum). Nulls form their own category, as in
    * ClickHouse. Output: keys :+ (n_rows, n_categories, entropy).
    */
  def entropy(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    val counts = df.groupBy((keys.map(col) :+ value.as("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    val term = round(col("__c").cast("double") *
      log2(col("__c").cast("double")), 9).cast("decimal(28,9)")
    counts.groupBy(keys.map(col): _*)
      .agg(sum(col("__c")).as("n_rows"),
        count(lit(1)).as("n_categories"),
        sum(term).as("__clogc"))
      .withColumn("entropy",
        round(log2(col("n_rows").cast("double")) -
          col("__clogc").cast("double") / col("n_rows").cast("double"), 6))
      .drop("__clogc")
  }

  /** Cramér's V association between two categorical columns per key:
    * V = sqrt( (χ²/n) / (min(r, c) − 1) ), computed through the
    * observed-cells-only identity
    *
    *   χ² = Σ_cells (o − e)²/e = Σ_observed o²·n/(ra·cb) − n
    *
    * (expand the square; Σ e over ALL r×c cells telescopes to n, and
    * empty cells contribute 0 to the o²/e sum) — so the full grid
    * never materializes and the plan stays one corpus scan: one
    * (keys, a, b) count aggregate, then three cell-table windows for
    * the margins (cell-cardinality rows, never input rows) and one
    * final fold. Degenerate keys (r = 1 or c = 1 — no association to
    * measure) yield null; a NULL category is a real row/column of the
    * table (GROUP BY keeps it in both engines). All counts exact;
    * per-cell terms follow the round-9 DECIMAL sum discipline.
    * Output: keys :+ (n_rows, chi2, cramers_v).
    */
  def cramersV(df: DataFrame, keys: Seq[String], a: Column,
      b: Column): DataFrame = {
    val cells = df.groupBy((keys.map(col) :+ a.as("__a")) :+ b.as("__b"): _*)
      .agg(count(lit(1)).as("__o"))
    val wa = Window.partitionBy((keys.map(col) :+ col("__a")): _*)
    val wb = Window.partitionBy((keys.map(col) :+ col("__b")): _*)
    val wk = Window.partitionBy(keys.map(col): _*)
    val withMargins = cells
      .withColumn("__ra", sum(col("__o")).over(wa))
      .withColumn("__cb", sum(col("__o")).over(wb))
      .withColumn("__n", sum(col("__o")).over(wk))
    val term = round(
      col("__o").cast("double") * col("__o").cast("double") *
        col("__n").cast("double") /
        (col("__ra").cast("double") * col("__cb").cast("double")),
      9).cast("decimal(28,9)")
    withMargins
      .withColumn("__t", term)
      .groupBy(keys.map(col): _*)
      // count_distinct over a STRUCT wrapper: the struct itself is
      // never null, so a NULL category counts as the real row/column
      // it is (bare count_distinct(__a) would skip it, undercounting
      // min(r,c)−1 and inflating V past 1 on {NULL, x} dimensions)
      .agg(max(col("__n")).as("n_rows"),
        count_distinct(struct(col("__a"))).as("__r"),
        count_distinct(struct(col("__b"))).as("__c"),
        sum(col("__t")).as("__sum"))
      // greatest(…, 0): the identity is ≥ 0 exactly, but the round-9
      // term truncation can land a hair below zero — and a -0.0 here
      // would be a cross-engine hash hazard
      .withColumn("chi2",
        round(greatest(
          col("__sum").cast("double") - col("n_rows").cast("double"),
          lit(0.0)), 6))
      .withColumn("cramers_v",
        when(least(col("__r"), col("__c")) > 1L,
          round(sqrt(greatest(
            col("__sum").cast("double") - col("n_rows").cast("double"),
            lit(0.0)) /
            col("n_rows").cast("double") /
            (least(col("__r"), col("__c")) - 1L).cast("double")), 6)))
      .drop("__r", "__c", "__sum")
  }

  /** The full categorical-association panel per key — ClickHouse's
    * `cramersV` / `cramersVBiasCorrected` / `contingency` / `theilsU`
    * in one operator over one shared contingency core ([[cramersV]]
    * stays as the single-statistic face):
    *
    *   φ² = χ²/n                       (χ² via the o²·n/(ra·cb) identity)
    *   V  = sqrt(φ² / (min(r,c) − 1))
    *   V⁺ = sqrt(max(0, φ² − (r−1)(c−1)/(n−1)) / (min(r̃,c̃) − 1)),
    *        r̃ = r − (r−1)²/(n−1)       (Bergsma 2013 bias correction)
    *   C  = sqrt(χ² / (χ² + n))        (Pearson's contingency coefficient)
    *   U(a|b) = (H(a) + H(b) − H(a,b)) / H(a)   (uncertainty coefficient;
    *        H(a|b) = H(a,b) − H(b) eliminated, count-only entropies)
    *
    * One corpus scan: the (keys, a, b) cell count is the only pass
    * over input rows; margins ride the cell table's windows, and the
    * marginal-entropy terms attach to ONE representative row per
    * margin group (a `row_number` on the SAME margin partitioning —
    * no extra pass, no distinct-margin join back to the corpus), so
    * the closing fold is a single keys-level aggregate. All counts
    * exact, every log/χ² term round-9 DECIMAL-summed (the [[entropy]]
    * discipline); mutual information clamped at 0 and U at 1 — the
    * identities hold exactly, the clamps kill round-9 residue (and
    * the −0.0 hash hazard). Degenerate margins: r = c = 1 yields null
    * V/V⁺/U; H(a) = 0 yields null U(a|b). Output: keys :+ (n_rows,
    * chi2, cramers_v, cramers_v_bc, contingency, theils_u_ab,
    * theils_u_ba), round-6.
    */
  def association(df: DataFrame, keys: Seq[String], a: Column,
      b: Column): DataFrame = {
    val cells = df.groupBy((keys.map(col) :+ a.as("__a")) :+ b.as("__b"): _*)
      .agg(count(lit(1)).as("__o"))
    val wa = Window.partitionBy((keys.map(col) :+ col("__a")): _*)
    val wb = Window.partitionBy((keys.map(col) :+ col("__b")): _*)
    val wk = Window.partitionBy(keys.map(col): _*)
    def term9(c: Column) = round(c, 9).cast("decimal(28,9)")
    def clogc(c: Column) =
      term9(c.cast("double") * log2(c.cast("double")))
    val annotated = cells
      .withColumn("__ra", sum(col("__o")).over(wa))
      .withColumn("__cb", sum(col("__o")).over(wb))
      .withColumn("__n", sum(col("__o")).over(wk))
      // one representative row per margin group carries its entropy
      // term — row_number rides the SAME margin partitioning (the
      // pick is order-free: the term only depends on the margin sum)
      .withColumn("__rna", row_number().over(wa.orderBy(col("__b"))))
      .withColumn("__rnb", row_number().over(wb.orderBy(col("__a"))))
    val agg = annotated
      .withColumn("__tchi", term9(
        col("__o").cast("double") * col("__o").cast("double") *
          col("__n").cast("double") /
          (col("__ra").cast("double") * col("__cb").cast("double"))))
      .withColumn("__tab", clogc(col("__o")))
      .withColumn("__ta", when(col("__rna") === 1, clogc(col("__ra"))))
      .withColumn("__tb", when(col("__rnb") === 1, clogc(col("__cb"))))
      .groupBy(keys.map(col): _*)
      // r/c ride the existing representative-row markers, which are
      // null-inclusive (row_number partitions keep the NULL category
      // as a real group; bare count_distinct would drop it and
      // desynchronize r/c from the entropy terms that DO include it)
      .agg(max(col("__n")).as("n_rows"),
        sum(when(col("__rna") === 1, 1L)).as("__r"),
        sum(when(col("__rnb") === 1, 1L)).as("__c"),
        sum(col("__tchi")).as("__schi"),
        sum(col("__tab")).as("__sab"),
        sum(col("__ta")).as("__sa"),
        sum(col("__tb")).as("__sb"))
    val n = col("n_rows").cast("double")
    val r = col("__r").cast("double")
    val c = col("__c").cast("double")
    val chi2 = greatest(col("__schi").cast("double") - n, lit(0.0))
    def h(s: String) = log2(n) - col(s).cast("double") / n
    val (ha, hb, hab) = (h("__sa"), h("__sb"), h("__sab"))
    val mi = greatest(ha + hb - hab, lit(0.0))
    val phi2 = chi2 / n
    val kMin = least(col("__r"), col("__c"))
    val phi2p = greatest(phi2 - (r - 1.0) * (c - 1.0) / (n - 1.0), lit(0.0))
    val rT = r - (r - 1.0) * (r - 1.0) / (n - 1.0)
    val cT = c - (c - 1.0) * (c - 1.0) / (n - 1.0)
    val bcDen = least(rT, cT) - lit(1.0)
    agg.select((keys.map(col) ++ Seq(
      col("n_rows"),
      round(chi2, 6).as("chi2"),
      when(kMin > 1L, round(sqrt(phi2 / (kMin.cast("double") - 1.0)), 6))
        .as("cramers_v"),
      when(col("n_rows") > 1L && bcDen > lit(0.0),
        round(sqrt(phi2p / bcDen), 6)).as("cramers_v_bc"),
      round(sqrt(chi2 / (chi2 + n)), 6).as("contingency"),
      when(ha > lit(0.0), round(least(mi / ha, lit(1.0)), 6))
        .as("theils_u_ab"),
      when(hb > lit(0.0), round(least(mi / hb, lit(1.0)), 6))
        .as("theils_u_ba"))): _*)
  }

  /** Exact-moment shape statistics per key — ClickHouse `skewPop` /
    * `kurtPop`. Spark's builtin `skewness`/`kurtosis` accumulate
    * doubles in partition order (cross-engine irreproducible, the A17
    * problem), so this computes the four POWER SUMS S1..S4 of the
    * fixed-point value w = floor(v·10^scale) as exact DECIMAL(38,0)
    * integers — order-free — and derives the central moments through
    * one fixed double expression tree:
    *
    *   m2 = S2/n − μ²,  m3 = S3/n − 3μS2/n + 2μ³,
    *   m4 = S4/n − 4μS3/n + 6μ²S2/n − 3μ⁴
    *   skew_pop = m3/m2^1.5, kurt_pop = m4/m2²  (null when m2 ≈ 0)
    *
    * The fixed-point floor is the q_sum_foreach convention (floor of
    * the same IEEE product is identical in every engine, where
    * rounding half-cases are not). w magnitudes must keep n·w⁴ inside
    * DECIMAL(38) — with scale 2 and |v| ≤ 10⁵ that allows ~10⁹ rows
    * per group. Nulls are skipped. Output: keys :+ (n_rows, mean,
    * skew_pop, kurt_pop), mean/skew/kurt rounded to 6.
    */
  def moments(df: DataFrame, keys: Seq[String], value: Column,
      scale: Int = 2): DataFrame = {
    val (out, mu, m2, m3, m4) = centralMoments(df, keys, value, scale)
    out.select((keys.map(col) ++ Seq(
      col("n_rows"),
      round(mu, 6).as("mean"),
      when(m2 > 1e-12, round(m3 / sqrt(m2 * m2 * m2), 6)).as("skew_pop"),
      when(m2 > 1e-12, round(m4 / (m2 * m2), 6)).as("kurt_pop"))): _*)
  }

  /** Shared core of [[moments]] and [[jarqueBera]]: the exact
    * DECIMAL(38,0) power-sum aggregate S1..S4 of w = floor(v·10^scale)
    * and the fixed double expression tree for (μ, m2, m3, m4).
    * DECIMAL(38) bound (documented on [[moments]]): n·w⁴ must fit —
    * with scale 2 and |v| ≤ 10⁵ that allows ~10⁹ rows per group;
    * overflow yields silent null sums, so callers inherit that bound.
    * Returns the aggregated frame (keys :+ n_rows :+ __s1..__s4) and
    * the derived column trees, built once so both consumers stay
    * bit-identical.
    */
  private def centralMoments(df: DataFrame, keys: Seq[String],
      value: Column, scale: Int)
      : (DataFrame, Column, Column, Column, Column) = {
    val factor = math.pow(10.0, scale)
    val w = floor(value.cast("double") * lit(factor)).cast("decimal(38,0)")
    // value.isNotNull alone lets NaN through, and Spark's
    // floor(NaN) is 0 — the row would be counted in n_rows with a
    // fabricated zero in every power sum, silently corrupting the
    // moments; drop it explicitly
    val out = df.where(value.isNotNull && !isnan(value.cast("double")))
      .withColumn("__w", w)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__w")).as("__s1"),
        sum(col("__w") * col("__w")).as("__s2"),
        sum(col("__w") * col("__w") * col("__w")).as("__s3"),
        sum(col("__w") * col("__w") * col("__w") * col("__w")).as("__s4"))
    val n = col("n_rows").cast("double")
    val s1 = col("__s1").cast("double") / lit(factor)
    val s2 = col("__s2").cast("double") / lit(factor * factor)
    val s3 = col("__s3").cast("double") / lit(factor * factor * factor)
    val s4 = col("__s4").cast("double") / lit(factor * factor * factor * factor)
    val mu = s1 / n
    val m2 = s2 / n - mu * mu
    val m3 = s3 / n - lit(3.0) * mu * s2 / n + lit(2.0) * mu * mu * mu
    val m4 = s4 / n - lit(4.0) * mu * s3 / n +
      lit(6.0) * mu * mu * s2 / n - lit(3.0) * mu * mu * mu * mu
    (out, mu, m2, m3, m4)
  }

  /** Welch's unequal-variance t statistic between two cohorts per
    * key — ClickHouse `welchTTest`'s t value plus the
    * Welch–Satterthwaite degrees of freedom (the p-value needs the
    * incomplete beta function, out of scope — the t and df are the
    * reproducible algebra; a consumer applies any t-distribution
    * table). `cohort` must be a boolean: true rows form sample 1,
    * false rows sample 2; null cohorts and null values are skipped.
    *
    *   t  = (μ1 − μ2) / sqrt(v1/n1 + v2/n2)   (vi = unbiased variance)
    *   df = (v1/n1 + v2/n2)² / ((v1/n1)²/(n1−1) + (v2/n2)²/(n2−1))
    *
    * Same exact fixed-point power-sum discipline as [[moments]]; one
    * (keys) partial+final aggregate with conditional sums — cohorts
    * never shuffle separately. Keys where either cohort has < 2
    * samples or zero variance yield nulls. Output: keys :+ (n1, n2,
    * mean1, mean2, t_stat, df), doubles rounded to 6.
    */
  def welchTTest(df: DataFrame, keys: Seq[String], value: Column,
      cohort: Column, scale: Int = 2): DataFrame = {
    val factor = math.pow(10.0, scale)
    val out = cohortSums(df, keys, value, cohort, factor)
    val (mu1, v1) = cohortStats(col("n1"), col("__a1"), col("__b1"), factor)
    val (mu2, v2) = cohortStats(col("n2"), col("__a2"), col("__b2"), factor)
    val se2 = v1 / col("n1").cast("double") + v2 / col("n2").cast("double")
    val dfW = se2 * se2 / (
      (v1 / col("n1").cast("double")) * (v1 / col("n1").cast("double")) /
        (col("n1").cast("double") - lit(1.0)) +
      (v2 / col("n2").cast("double")) * (v2 / col("n2").cast("double")) /
        (col("n2").cast("double") - lit(1.0)))
    val ok = col("n1") > 1 && col("n2") > 1 && se2 > lit(1e-12)
    // two-sided t p through the EXACT identity P(|T_ν|>t) = P(F₁,ν>t²)
    // off the rounded statistic pair the gate already proves
    val tOut = when(ok, round((mu1 - mu2) / sqrt(se2), 6))
    val dfOut = when(ok, round(dfW, 6))
    out.select((keys.map(col) ++ Seq(
      col("n1"), col("n2"),
      round(mu1, 6).as("mean1"), round(mu2, 6).as("mean2"),
      tOut.as("t_stat"), dfOut.as("df"))): _*)
      .withColumn("p_approx", graft.functions.NormalDist.fUpperP(
        col("t_stat") * col("t_stat"), lit(1L), col("df")))
  }

  /** Student's pooled-variance t statistic between two cohorts per
    * key — ClickHouse `studentTTest`, the equal-variance companion to
    * [[welchTTest]] (same cohort convention, same exact conditional
    * power sums, same single partial+final aggregate):
    *
    *   sp² = ((n1−1)v1 + (n2−1)v2) / (n1+n2−2)
    *   t   = (μ1 − μ2) / sqrt(sp²·(1/n1 + 1/n2)),  df = n1+n2−2
    *
    * Keys where either cohort is empty, n1+n2 < 3, or the pooled
    * variance vanishes yield null t. Output: keys :+ (n1, n2, mean1,
    * mean2, t_stat, df), doubles rounded to 6.
    */
  def studentTTest(df: DataFrame, keys: Seq[String], value: Column,
      cohort: Column, scale: Int = 2): DataFrame = {
    val factor = math.pow(10.0, scale)
    val out = cohortSums(df, keys, value, cohort, factor)
    val (mu1, v1) = cohortStats(col("n1"), col("__a1"), col("__b1"), factor)
    val (mu2, v2) = cohortStats(col("n2"), col("__a2"), col("__b2"), factor)
    val n1 = col("n1").cast("double")
    val n2 = col("n2").cast("double")
    val dfS = n1 + n2 - lit(2.0)
    val sp2 = ((n1 - lit(1.0)) * v1 + (n2 - lit(1.0)) * v2) / dfS
    val se2 = sp2 * (lit(1.0) / n1 + lit(1.0) / n2)
    val ok = col("n1") > 0 && col("n2") > 0 && col("n1") + col("n2") > 2 &&
      se2 > lit(1e-12)
    val tOut = when(ok, round((mu1 - mu2) / sqrt(se2), 6))
    val dfOut = when(col("n1") + col("n2") > 2, dfS.cast("long"))
    out.select((keys.map(col) ++ Seq(
      col("n1"), col("n2"),
      round(mu1, 6).as("mean1"), round(mu2, 6).as("mean2"),
      tOut.as("t_stat"), dfOut.as("df"))): _*)
      .withColumn("p_approx", graft.functions.NormalDist.fUpperP(
        col("t_stat") * col("t_stat"), lit(1L), col("df")))
  }

  /** Two-sample mean z test per key — ClickHouse `meanZTest`: the
    * KNOWN-variance member of the test panel (variances are inputs,
    * not estimates — the regime of a long-running metric whose
    * population variance is established):
    *
    *   z = (μ1 − μ2) / sqrt(σ1²/n1 + σ2²/n2)
    *
    * Same cohort convention and exact conditional power-sum aggregate
    * as [[welchTTest]]/[[studentTTest]] (the S2 sums are carried but
    * unused — the shared core stays one code path). Keys with an
    * empty cohort yield null. Output: keys :+ (n1, n2, mean1, mean2,
    * z_stat, p_value), round-6.
    */
  def meanZTest(df: DataFrame, keys: Seq[String], value: Column,
      cohort: Column, var1: Double, var2: Double,
      scale: Int = 2): DataFrame = {
    require(var1 > 0 && var2 > 0, "population variances must be positive")
    val factor = math.pow(10.0, scale)
    val out = cohortSums(df, keys, value, cohort, factor)
    val (mu1, _) = cohortStats(col("n1"), col("__a1"), col("__b1"), factor)
    val (mu2, _) = cohortStats(col("n2"), col("__a2"), col("__b2"), factor)
    val se2 = lit(var1) / col("n1").cast("double") +
      lit(var2) / col("n2").cast("double")
    val ok = col("n1") > 0 && col("n2") > 0
    val zOut = when(ok, round((mu1 - mu2) / sqrt(se2), 6))
    // p in a SECOND projection off the named column: inlining the
    // statistic tree into the Φ polynomial's ~4 references blows the
    // expression tree up exponentially (measured 443 KB → 21 KB plan
    // text, 5.7 s → 0.1 s planning+codegen on the welch face)
    out.select((keys.map(col) ++ Seq(
      col("n1"), col("n2"),
      when(col("n1") > 0, round(mu1, 6)).as("mean1"),
      when(col("n2") > 0, round(mu2, 6)).as("mean2"),
      zOut.as("z_stat"))): _*)
      .withColumn("p_value",
        graft.functions.NormalDist.twoSidedP(col("z_stat")))
  }

  /** A35: paired t test per key — the repeated-measures member of the
    * test panel (scipy `ttest_rel`; ClickHouse users build it from
    * `studentTTest` over differences): for row-paired observations
    * (x, y), the one-sample t of the differences,
    *
    *   d̄ = Σd/n,  s_d² = (Σd² − n·d̄²)/(n−1),
    *   t = d̄ / sqrt(s_d²/n),  df = n − 1
    *
    * The difference enters as the EXACT integer
    * w_d = floor(x·10^s) − floor(y·10^s) (two fixed-point floors, one
    * exact DECIMAL subtraction — never a double difference of
    * near-equal magnitudes), and both power sums ride ONE
    * partial+final hash aggregate (the [[moments]] discipline).
    * Rows with a null/NaN side drop whole (pairing requires both);
    * n < 2 or vanishing s_d yields null t. Output: keys :+
    * (n_pairs, mean_diff, t_stat, df), round-6.
    */
  def pairedTTest(df: DataFrame, keys: Seq[String], x: Column,
      y: Column, scale: Int = 2): DataFrame = {
    val factor = math.pow(10.0, scale)
    def fp(c: Column) =
      floor(c.cast("double") * lit(factor)).cast("decimal(38,0)")
    val base = df
      .where(x.isNotNull && !isnan(x.cast("double")) &&
        y.isNotNull && !isnan(y.cast("double")))
      .withColumn("__d", fp(x) - fp(y))
    val out = base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__d")).as("__s1"),
        sum(col("__d") * col("__d")).as("__s2"))
    val n = col("n_pairs").cast("double")
    val s1 = col("__s1").cast("double") / lit(factor)
    val s2 = col("__s2").cast("double") / lit(factor * factor)
    val mu = s1 / n
    val vd = (s2 - n * mu * mu) / (n - lit(1.0))
    val ok = col("n_pairs") > 1 && vd > lit(1e-12)
    val tOut = when(ok, round(mu / sqrt(vd / n), 6))
    val dfOut = when(col("n_pairs") > 1,
      (col("n_pairs") - 1).cast("long"))
    out.select((keys.map(col) ++ Seq(
      col("n_pairs"),
      when(col("n_pairs") > 0, round(mu, 6)).as("mean_diff"),
      tOut.as("t_stat"), dfOut.as("df"))): _*)
      .withColumn("p_approx", graft.functions.NormalDist.fUpperP(
        col("t_stat") * col("t_stat"), lit(1L), col("df")))
  }

  /** Shared cohort machinery for the two-sample t tests: one
    * partial+final aggregate carrying each cohort's exact fixed-point
    * S1/S2 power sums ([[moments]] discipline) as conditional sums —
    * the cohorts never shuffle apart.
    */
  private def cohortSums(df: DataFrame, keys: Seq[String], value: Column,
      cohort: Column, factor: Double): DataFrame = {
    val w = floor(value.cast("double") * lit(factor)).cast("decimal(38,0)")
    def side(flag: Boolean, c: Column) = sum(when(cohort === flag, c))
    // NaN floors to a fabricated 0 fixed-point — drop the row rather
    // than count it against zeroed power-sum mass
    df.where(value.isNotNull && !isnan(value.cast("double")) &&
        cohort.isNotNull)
      .withColumn("__w", w)
      .groupBy(keys.map(col): _*)
      .agg(
        count(when(cohort === true, lit(1))).as("n1"),
        count(when(cohort === false, lit(1))).as("n2"),
        side(true, col("__w")).as("__a1"),
        side(true, col("__w") * col("__w")).as("__b1"),
        side(false, col("__w")).as("__a2"),
        side(false, col("__w") * col("__w")).as("__b2"))
  }

  /** (mean, unbiased variance) from one cohort's exact power sums:
    * Σ(w−μ)²/(n−1) = (S2 − n·μ²)/(n−1). */
  private def cohortStats(nC: Column, aC: Column, bC: Column,
      factor: Double): (Column, Column) = {
    val n = nC.cast("double")
    val s1 = aC.cast("double") / lit(factor)
    val s2 = bC.cast("double") / lit(factor * factor)
    val mu = s1 / n
    (mu, (s2 - n * mu * mu) / (n - lit(1.0)))
  }

  /** One-way ANOVA F statistic per key — ClickHouse
    * `analysisOfVariance` (the k-cohort extension of [[studentTTest]]:
    * "do these k groups share a mean?"):
    *
    *   SSB = Σ_g S1g²/ng − S1²/n,  SSW = S2 − Σ_g S1g²/ng
    *   F   = (SSB/(k−1)) / (SSW/(n−k)),  df = (k−1, n−k)
    *
    * computed over per-group exact fixed-point power sums (the
    * [[moments]] discipline): stage 1 is a (keys, group) partial+final
    * aggregate carrying (ng, S1g, S2g) — raw volume reaches one
    * shuffle, once; stage 2 folds GROUP-cardinality rows per key. The
    * only non-integer quantity, S1g²/ng, is one fixed double tree per
    * group, round-9 DECIMAL-summed (the [[cramersV]] term discipline),
    * and F is scale-invariant so the fixed-point w-units never
    * descale. NULL group is its own cohort (as in GROUP BY); null
    * values drop. Keys with k < 2, n ≤ k, or zero within-variance
    * yield null F. Output: keys :+ (n_rows, n_groups, f_stat, df1,
    * df2), F rounded to 6.
    */
  def anova(df: DataFrame, keys: Seq[String], value: Column,
      group: Column, scale: Int = 2): DataFrame = {
    val factor = math.pow(10.0, scale)
    val w = floor(value.cast("double") * lit(factor)).cast("decimal(38,0)")
    // NaN floors to a fabricated 0 fixed-point — drop the row rather
    // than count it against zeroed power-sum mass
    val groups = df.where(value.isNotNull && !isnan(value.cast("double")))
      .withColumn("__w", w)
      .groupBy(keys.map(col) :+ group.as("__g"): _*)
      .agg(count(lit(1)).as("__ng"), sum(col("__w")).as("__s1"),
        sum(col("__w") * col("__w")).as("__s2"))
    val s1d = col("__s1").cast("double")
    val term = round(s1d * s1d / col("__ng").cast("double"), 9)
      .cast("decimal(38,9)")
    val agg = groups
      .withColumn("__t", term)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__ng")).as("n_rows"), count(lit(1)).as("n_groups"),
        sum(col("__s1")).as("__a"), sum(col("__s2")).as("__b"),
        sum(col("__t")).as("__p"))
    val n = col("n_rows").cast("double")
    val k = col("n_groups").cast("double")
    val a = col("__a").cast("double")
    val p = col("__p").cast("double")
    val ssb = greatest(p - a * a / n, lit(0.0))
    val ssw = greatest(col("__b").cast("double") - p, lit(0.0))
    val ok = col("n_groups") > 1 && col("n_rows") > col("n_groups") &&
      ssw > lit(1e-9)
    val fOut = when(ok, round((ssb / (k - lit(1.0))) / (ssw / (n - k)), 6))
    val d1 = when(col("n_groups") > 1, (col("n_groups") - 1).cast("long"))
    val d2 = when(col("n_rows") > col("n_groups"),
      (col("n_rows") - col("n_groups")).cast("long"))
    agg.select((keys.map(col) ++ Seq(
      col("n_rows"), col("n_groups"),
      fOut.as("f_stat"), d1.as("df1"), d2.as("df2"))): _*)
      .withColumn("p_approx", graft.functions.NormalDist.fUpperP(
        col("f_stat"), col("df1"), col("df2")))
  }

  /** A28b — Brown–Forsythe test (Brown & Forsythe 1974; the
    * median-centered Levene): are the GROUP VARIANCES equal? The
    * homogeneity check ANOVA itself assumes, and the robust choice
    * over classic mean-centered Levene on the heavy-tailed telemetry
    * this engine sees. The statistic is one-way ANOVA applied to the
    * absolute deviations from each group's MEDIAN — so the whole face
    * composes from gate-proven pieces: exact fixed-point group
    * medians (the A16 percentile on the quantized grid, exact .0/.5
    * halves), deviations |w − med| on the exact half-integer grid
    * DOUBLED back onto integers (F is scale-invariant — SSB and SSW
    * both scale by 4, the ratio doesn't), then [[anova]] verbatim at
    * scale 0. Output: the A28 schema (n_rows, n_groups, f_stat,
    * df1/df2, p_approx via the shared F tail).
    */
  def brownForsythe(df: DataFrame, keys: Seq[String], value: Column,
      group: Column, scale: Int = 2): DataFrame = {
    val factor = math.pow(10.0, scale)
    val rows = df.where(value.isNotNull && !isnan(value.cast("double")))
      .select((keys.map(col) :+ group.as("__g")) :+
        floor(value.cast("double") * lit(factor)).as("__w"): _*)
    val med = rows.groupBy((keys.map(col) :+ col("__g")): _*)
      .agg(expr("percentile(__w, 0.5D)").as("__med"))
    val z = rows.join(broadcast(med), keys :+ "__g")
      .withColumn("__z", abs(col("__w") - col("__med")) * lit(2.0))
    anova(z, keys, col("__z"), col("__g"), scale = 0)
  }

  /** Weight-of-evidence and information value per category — the
    * ClickHouse `categoricalInformationValue` read ("how predictive is
    * this categorical feature of a binary label"), emitted as the full
    * per-category WOE table every filtering-model iteration inspects:
    *
    *   WOE_c = ln( (pos_c/posTot) / (neg_c/negTot) )
    *   IV_c  = (pos_c/posTot − neg_c/negTot) · WOE_c,  IV = Σ_c IV_c
    *
    * One corpus scan into a (keys, category) conditional-count
    * aggregate; label totals ride a keys window over CATEGORY-
    * cardinality rows; WOE/IV are fixed double trees over exact
    * counts, the per-category IV term round-9 DECIMAL-summed into the
    * keys-level total (the [[association]] discipline) so `iv_total`
    * is order-free. A category with an empty cell (pos_c = 0 or
    * neg_c = 0) has undefined WOE — null, excluded from the total, as
    * is a key with an empty label side. Null labels drop; a NULL
    * category is a real category. Output: keys :+ (category, n_pos,
    * n_neg, woe, iv, iv_total), round-6.
    */
  def informationValue(df: DataFrame, keys: Seq[String], category: Column,
      label: Column): DataFrame = {
    val cells = df.where(label.isNotNull)
      .groupBy(keys.map(col) :+ category.as("category"): _*)
      .agg(count(when(label === true, lit(1))).as("n_pos"),
        count(when(label === false, lit(1))).as("n_neg"))
    val wk = Window.partitionBy(keys.map(col): _*)
    val pt = sum(col("n_pos")).over(wk)
    val nt = sum(col("n_neg")).over(wk)
    val rp = col("n_pos").cast("double") / pt.cast("double")
    val rn = col("n_neg").cast("double") / nt.cast("double")
    val woe = log(rp / rn)
    val defined = col("n_pos") > 0 && col("n_neg") > 0 && pt > 0 && nt > 0
    val ivTerm = when(defined,
      round((rp - rn) * woe, 9).cast("decimal(28,9)"))
    cells
      .withColumn("woe", when(defined, round(woe, 6)))
      .withColumn("iv", when(defined, round((rp - rn) * woe, 6)))
      .withColumn("iv_total",
        round(sum(ivTerm).over(wk).cast("double"), 6))
  }

  /** Spearman rank correlation per key — ClickHouse `rankCorr`.
    * Ties take the average (fractional) rank; the repro trick is that
    * DOUBLED average ranks are exact integers:
    *
    *   2·avgrank = 2·minrank + peers − 1
    *
    * (minrank from `rank()`, peers from a RANGE `CURRENT ROW`-to-
    * `CURRENT ROW` frame count over the SAME sort — all x-equal rows
    * are frame peers, so no extra window exchange). Pearson's formula
    * over the doubled ranks equals Spearman's ρ exactly (correlation
    * is scale-invariant), and all five sums are exact DECIMAL
    * integers — the [[moments]] discipline; the final ρ is one fixed
    * double tree, bit-identical cross-engine. Null x or y rows drop
    * (pairwise deletion, as in ClickHouse).
    *
    * Plan: ONE hash exchange on keys, two sorts (x-ranks, y-ranks)
    * reusing it, one partial+final aggregate on the same key hash —
    * rank correlation at the cost of one shuffle. A constant margin
    * (all x equal or all y equal) yields null. Output: keys :+
    * (n_rows, rank_corr), ρ rounded to 6.
    */
  def rankCorr(df: DataFrame, keys: Seq[String], x: Column,
      y: Column): DataFrame = {
    val base = df.where(x.isNotNull && y.isNotNull)
      .select((keys.map(col) :+ x.as("__x")) :+ y.as("__y"): _*)
    def rank2(v: String) = {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(col(v))
      val peers = count(lit(1))
        .over(w.rangeBetween(Window.currentRow, Window.currentRow))
      (rank().over(w).cast("long") * 2 + peers - 1).cast("decimal(19,0)")
    }
    val ranked = base
      .withColumn("__rx", rank2("__x"))
      .withColumn("__ry", rank2("__y"))
    val agg = ranked.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__rx")).as("__sx"), sum(col("__ry")).as("__sy"),
        sum(col("__rx") * col("__rx")).as("__sxx"),
        sum(col("__ry") * col("__ry")).as("__syy"),
        sum(col("__rx") * col("__ry")).as("__sxy"))
    val n = col("n_rows").cast("double")
    def d(c: String) = col(c).cast("double")
    val varX = n * d("__sxx") - d("__sx") * d("__sx")
    val varY = n * d("__syy") - d("__sy") * d("__sy")
    val cov = n * d("__sxy") - d("__sx") * d("__sy")
    agg.select((keys.map(col) ++ Seq(
      col("n_rows"),
      when(varX > lit(0.0) && varY > lit(0.0),
        round(cov / sqrt(varX) / sqrt(varY), 6)).as("rank_corr"))): _*)
  }

  /** Mann–Whitney U rank-sum test between two cohorts per key —
    * ClickHouse `mannWhitneyUTest`'s U statistics plus the
    * tie-corrected normal z and its two-sided normal p-value
    * ([[graft.functions.NormalDist]]). Same cohort convention as
    * the t tests; ranks run over the POOLED sample with [[rankCorr]]'s
    * exact doubled-average-rank machinery, so 2·R1 (doubled cohort-1
    * rank sum) is an exact integer and
    *
    *   U1 = R1 − n1(n1+1)/2,  U2 = n1·n2 − U1
    *   z  = (U1 − n1n2/2) / sqrt( n1n2/12 · (n+1 − ΣT/(n(n−1))) )
    *
    * with the tie term ΣT = Σ_groups(t³−t) folded as the exact
    * per-row sum Σ_rows(t²−1) (each of the t peer rows contributes
    * t²−1). No continuity correction (ClickHouse's default). Plan:
    * one key exchange, one sort, one aggregate. Keys with an empty
    * cohort or an all-tied sample (σ = 0) yield null z. Output:
    * keys :+ (n1, n2, u1, u2, z_stat, p_value), u/z/p rounded to 6.
    */
  def mannWhitneyUTest(df: DataFrame, keys: Seq[String], value: Column,
      cohort: Column): DataFrame = {
    val base = df.where(value.isNotNull && cohort.isNotNull)
      .select((keys.map(col) :+ value.as("__v")) :+ cohort.as("__c"): _*)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__v"))
    val peers = count(lit(1))
      .over(w.rangeBetween(Window.currentRow, Window.currentRow))
    val ranked = base
      .withColumn("__r2",
        (rank().over(w).cast("long") * 2 + peers - 1).cast("decimal(19,0)"))
      .withColumn("__tt",
        peers.cast("decimal(19,0)") * peers.cast("decimal(19,0)") - 1)
    val agg = ranked.groupBy(keys.map(col): _*)
      .agg(
        count(when(col("__c") === true, lit(1))).as("n1"),
        count(when(col("__c") === false, lit(1))).as("n2"),
        sum(when(col("__c") === true, col("__r2"))).as("__r1x2"),
        sum(col("__tt")).as("__ties"))
    val n1 = col("n1").cast("double")
    val n2 = col("n2").cast("double")
    val n = n1 + n2
    val u1 = (col("__r1x2").cast("double") - n1 * (n1 + lit(1.0))) / lit(2.0)
    val sigma2 = n1 * n2 / lit(12.0) *
      (n + lit(1.0) - col("__ties").cast("double") / (n * (n - lit(1.0))))
    val ok = col("n1") > 0 && col("n2") > 0 && sigma2 > lit(1e-12)
    val zOut = when(ok,
      round((u1 - n1 * n2 / lit(2.0)) / sqrt(sigma2), 6))
    agg.select((keys.map(col) ++ Seq(
      col("n1"), col("n2"),
      when(col("n1") > 0 && col("n2") > 0, round(u1, 6)).as("u1"),
      when(col("n1") > 0 && col("n2") > 0,
        round(n1 * n2 - u1, 6)).as("u2"),
      zOut.as("z_stat"))): _*)
      .withColumn("p_value",
        graft.functions.NormalDist.twoSidedP(col("z_stat")))
  }

  /** ROC AUC per key — ClickHouse `arrayAUC`, as a proper distributed
    * aggregate over (score, label) rows. The rank-sum identity
    * AUC = U₁/(n₁·n₂) ([[mannWhitneyUTest]]'s U with positives as
    * sample 1, ties at half credit) COLLAPSES TO DISTINCT-SCORE
    * CELLS: a cell at score v with p positives, q negatives and
    * exclusive prefix count cb contributes p·(2·cb + (p+q) + 1) to
    * the doubled rank sum — so the plan is one (keys, score)
    * partial+final count over the input (raw volume reaches one
    * shuffle, once), one cumulative window over CELL-cardinality
    * rows, one keys fold; every quantity an exact integer until the
    * final division. Null scores/labels drop. A key with an empty
    * class yields null. Output: keys :+ (n_pos, n_neg, auc), round-6.
    */
  def auc(df: DataFrame, keys: Seq[String], score: Column,
      label: Column): DataFrame =
    aucFromCells(scoreCells(df, keys, score, label), keys)

  /** The (keys, distinct-score) → (positive count, negative count)
    * cell table [[auc]] and [[ksTest]] fold over — exposed because it
    * is a SUMMABLE STATE: cells of disjoint row slices merge by
    * [[mergeScoreCells]] into exactly the whole-input cells (counts
    * add), which is what lets a streaming job maintain the cell table
    * per micro-batch ([[graft.streaming.StreamingScoreMonitor]]) and
    * serve live AUC/KS reads from CELL-cardinality state instead of
    * re-scanning score history. Null scores/labels drop.
    */
  def scoreCells(df: DataFrame, keys: Seq[String], score: Column,
      label: Column): DataFrame =
    df.where(score.isNotNull && label.isNotNull)
      .groupBy(keys.map(col) :+ score.as("__v"): _*)
      .agg(count(when(label === true, lit(1))).as("__p"),
        count(when(label === false, lit(1))).as("__q"))

  /** Merge any union of [[scoreCells]] frames: counts add per cell. */
  def mergeScoreCells(cells: DataFrame, keys: Seq[String]): DataFrame =
    cells.groupBy(keys.map(col) :+ col("__v"): _*)
      .agg(sum(col("__p")).as("__p"), sum(col("__q")).as("__q"))

  /** [[auc]]'s fold over an existing cell table. */
  def aucFromCells(cells: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__v"))
    val cb = coalesce(sum(col("__p") + col("__q"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val agg = cells
      .withColumn("__r1x2", col("__p").cast("decimal(19,0)") *
        (cb * 2 + col("__p") + col("__q") + 1).cast("decimal(19,0)"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__p")).as("n_pos"), sum(col("__q")).as("n_neg"),
        sum(col("__r1x2")).as("__s"))
    val n1 = col("n_pos").cast("double")
    val n2 = col("n_neg").cast("double")
    val u1 = (col("__s").cast("double") - n1 * (n1 + lit(1.0))) / lit(2.0)
    agg.select((keys.map(col) ++ Seq(
      col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        round(u1 / (n1 * n2), 6)).as("auc"))): _*)
  }

  /** Area under the precision-recall curve (average precision) per
    * key — ClickHouse `arrayAUCPR`'s read as a distributed aggregate,
    * the imbalanced-classes companion to [[auc]] over the SAME
    * [[scoreCells]] state (so [[graft.streaming.StreamingScoreMonitor]]
    * serves it live for free). Convention (stated, since engines
    * differ on ties): cells are processed in DESCENDING score order
    * as tie-blocks and
    *
    *   AP = Σ_blocks ΔR_i · P_i
    *      = Σ_i p_i · cumTP_i / (totP · (cumTP_i + cumFP_i))
    *
    * with P_i the precision at the block's cumulative counts — the
    * step/average-precision convention (trapezoid variants differ
    * only within tie-blocks). Every input to the per-cell double tree
    * is an exact integer; terms are round-9 DECIMAL-summed (the
    * [[cramersV]] discipline) so the fold is order-free. Keys with no
    * positives yield null. Output: keys :+ (n_pos, n_neg, pr_auc),
    * round-6.
    */
  def prAuc(df: DataFrame, keys: Seq[String], score: Column,
      label: Column): DataFrame =
    prAucFromCells(scoreCells(df, keys, score, label), keys)

  /** Full ROC curve per key — ClickHouse `arrayROCCurve`: one row per
    * distinct score threshold t (every cell of [[scoreCells]]), with
    * the exact confusion counts and rates after classifying
    * score ≥ t as positive. The dashboard read behind A27's single
    * number — and served live from the same maintained cell state.
    * Counts exact integers; tpr/fpr round-6 of an exact-integer
    * division; an empty class nulls its rate. Output: keys :+
    * (threshold, n_tp, n_fp, tpr, fpr), one row per distinct score.
    */
  def rocCurve(df: DataFrame, keys: Seq[String], score: Column,
      label: Column): DataFrame =
    rocCurveFromCells(scoreCells(df, keys, score, label), keys)

  /** [[rocCurve]]'s fold over an existing cell table. */
  def rocCurveFromCells(cells: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wk = Window.partitionBy(keys.map(col): _*)
    cells
      .withColumn("n_tp", sum(col("__p")).over(w))
      .withColumn("n_fp", sum(col("__q")).over(w))
      .withColumn("__totp", sum(col("__p")).over(wk))
      .withColumn("__totn", sum(col("__q")).over(wk))
      .select((keys.map(col) ++ Seq(
        col("__v").as("threshold"), col("n_tp"), col("n_fp"),
        when(col("__totp") > 0, round(
          col("n_tp").cast("double") / col("__totp").cast("double"), 6))
          .as("tpr"),
        when(col("__totn") > 0, round(
          col("n_fp").cast("double") / col("__totn").cast("double"), 6))
          .as("fpr"))): _*)
  }

  /** [[prAuc]]'s fold over an existing cell table. */
  def prAucFromCells(cells: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wk = Window.partitionBy(keys.map(col): _*)
    val annotated = cells
      .withColumn("__ctp", sum(col("__p")).over(w))
      .withColumn("__call", sum(col("__p") + col("__q")).over(w))
      .withColumn("__totp", sum(col("__p")).over(wk))
      .withColumn("__totn", sum(col("__q")).over(wk))
    val term = when(col("__p") > 0, round(
      col("__p").cast("double") * col("__ctp").cast("double") /
        (col("__totp").cast("double") * col("__call").cast("double")),
      9).cast("decimal(28,9)"))
    annotated
      .withColumn("__t", term)
      .groupBy(keys.map(col): _*)
      .agg(max(col("__totp")).as("n_pos"), max(col("__totn")).as("n_neg"),
        sum(col("__t")).as("__s"))
      .select((keys.map(col) ++ Seq(
        col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0, round(col("__s").cast("double"), 6))
          .as("pr_auc"))): _*)
  }

  /** Brier score per key — the proper scoring rule for probabilistic
    * predictions (Brier 1950): mean squared error between predicted
    * probability and the 0/1 outcome,
    *
    *   B = Σ_cells (p·(1−v)² + q·v²) / n
    *
    * over the SAME [[scoreCells]] state as [[auc]] (so the streaming
    * monitor serves it live). Scores are expected in [0, 1] — the
    * formula is plain MSE for anything else (documented, not
    * enforced). Per-cell terms are one fixed double tree over exact
    * counts, round-9 DECIMAL-summed; 0 is a perfect forecaster, 0.25
    * the uninformed-0.5 baseline. Output: keys :+ (n_rows, brier),
    * round-6.
    */
  def brierScore(df: DataFrame, keys: Seq[String], score: Column,
      label: Column): DataFrame =
    brierFromCells(scoreCells(df, keys, score, label), keys)

  /** [[brierScore]]'s fold over an existing cell table. */
  def brierFromCells(cells: DataFrame, keys: Seq[String]): DataFrame = {
    val v = col("__v").cast("double")
    val term = round(
      col("__p").cast("double") * (lit(1.0) - v) * (lit(1.0) - v) +
        col("__q").cast("double") * v * v, 9).cast("decimal(28,9)")
    cells
      .withColumn("__t", term)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__p") + col("__q")).as("n_rows"),
        sum(col("__t")).as("__s"))
      .select((keys.map(col) ++ Seq(
        col("n_rows"),
        when(col("n_rows") > 0, round(
          col("__s").cast("double") / col("n_rows").cast("double"), 6))
          .as("brier"))): _*)
  }

  /** Calibration (reliability) table per key — "when the model says
    * 0.7, does 70% actually happen": predicted probabilities bucketed
    * into `bins` equal-width bins over [0, 1], each bin reporting its
    * exact count, mean predicted score, and observed positive rate.
    * Computed over the SAME [[scoreCells]] state (streaming-servable);
    * the bin's score mass Σ v·(p+q) is round-9 DECIMAL-summed, counts
    * exact. Scores at 1.0 fold into the top bin (the half-open-grid
    * edge case); out-of-[0,1] scores clamp to the edge bins. Output:
    * keys :+ (bin, n_rows, n_pos, mean_score, pos_rate), round-6.
    */
  def calibrationCurve(df: DataFrame, keys: Seq[String], score: Column,
      label: Column, bins: Int = 10): DataFrame =
    calibrationFromCells(scoreCells(df, keys, score, label), keys, bins)

  /** [[calibrationCurve]]'s fold over an existing cell table. */
  def calibrationFromCells(cells: DataFrame, keys: Seq[String],
      bins: Int = 10): DataFrame = {
    require(bins >= 1, "need bins >= 1")
    val v = col("__v").cast("double")
    val bin = least(greatest(floor(v * bins).cast("long"), lit(0L)),
      lit(bins - 1L))
    val mass = round(v * (col("__p") + col("__q")).cast("double"), 9)
      .cast("decimal(28,9)")
    cells
      .withColumn("bin", bin)
      .withColumn("__m", mass)
      .groupBy(keys.map(col) :+ col("bin"): _*)
      .agg(sum(col("__p") + col("__q")).as("n_rows"),
        sum(col("__p")).as("n_pos"),
        sum(col("__m")).as("__s"))
      .select((keys.map(col) ++ Seq(
        col("bin"), col("n_rows"), col("n_pos"),
        round(col("__s").cast("double") / col("n_rows").cast("double"), 6)
          .as("mean_score"),
        round(col("n_pos").cast("double") / col("n_rows").cast("double"), 6)
          .as("pos_rate"))): _*)
  }

  /** Expected calibration error per key — the scalar summary of
    * [[calibrationCurve]] (Naeini et al. 2015's ECE):
    *
    *   ECE = Σ_bins (n_b/n) · |pos_rate_b − mean_score_b|
    *
    * folded over the same cells/bins (streaming-served like the rest
    * of the panel). The per-bin |·| term is one fixed double tree
    * over exact counts and the round-9-summed score mass, itself
    * round-9 DECIMAL-summed into the total. 0 = perfectly calibrated.
    * Output: keys :+ (n_rows, ece), round-6.
    */
  def expectedCalibrationError(df: DataFrame, keys: Seq[String],
      score: Column, label: Column, bins: Int = 10): DataFrame =
    eceFromCells(scoreCells(df, keys, score, label), keys, bins)

  /** [[expectedCalibrationError]]'s fold over an existing cell table. */
  def eceFromCells(cells: DataFrame, keys: Seq[String],
      bins: Int = 10): DataFrame = {
    val cal = calibrationFromCells(cells, keys, bins)
    val wk = Window.partitionBy(keys.map(col): _*)
    val n = sum(col("n_rows")).over(wk)
    val term = round(col("n_rows").cast("double") / n.cast("double") *
      abs(col("pos_rate") - col("mean_score")), 9).cast("decimal(28,9)")
    cal
      .withColumn("__t", term)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        round(sum(col("__t")).cast("double"), 6).as("ece"))
  }

  /** Two-sample Kolmogorov–Smirnov D statistic per key — ClickHouse
    * `kolmogorovSmirnovTest`'s D (the p-value is an asymptotic series,
    * out of scope — the [[welchTTest]] posture):
    *
    *   D = max_v |F₁(v) − F₂(v)|
    *     = max_v |cum₁(v)·n₂ − cum₂(v)·n₁| / (n₁·n₂)
    *
    * evaluated at distinct-value boundaries over the same
    * (keys, value) CELL collapse as [[auc]] — the numerator is an
    * exact integer at every boundary, so the max is deterministic and
    * only the final division touches doubles. One corpus-count pass,
    * one cell-table cumulative window, one keys fold. Keys with an
    * empty cohort yield null. Output: keys :+ (n1, n2, d_stat),
    * round-6.
    */
  def ksTest(df: DataFrame, keys: Seq[String], value: Column,
      cohort: Column): DataFrame =
    ksFromCells(scoreCells(df, keys, value, cohort), keys)

  /** [[ksTest]]'s fold over an existing cell table. */
  def ksFromCells(cells: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__v"))
    val inc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val agg = cells
      .withColumn("__cp", sum(col("__p")).over(inc))
      .withColumn("__cq", sum(col("__q")).over(inc))
      .withColumn("__n1", sum(col("__p")).over(whole))
      .withColumn("__n2", sum(col("__q")).over(whole))
      .withColumn("__d", abs(
        col("__cp").cast("decimal(19,0)") * col("__n2").cast("decimal(19,0)")
          - col("__cq").cast("decimal(19,0)") *
            col("__n1").cast("decimal(19,0)")))
      .groupBy(keys.map(col): _*)
      .agg(max(col("__n1")).as("n1"), max(col("__n2")).as("n2"),
        max(col("__d")).as("__dmax"))
    val dOut = when(col("n1") > 0 && col("n2") > 0,
      round(col("__dmax").cast("double") /
        (col("n1").cast("double") * col("n2").cast("double")), 6))
    // asymptotic two-sample p: λ = D·sqrt(n1·n2/(n1+n2)) into the
    // Kolmogorov tail, off the rounded D the gate already proves
    agg.select((keys.map(col) ++ Seq(
      col("n1"), col("n2"),
      dOut.as("d_stat"))): _*)
      .withColumn("p_approx", graft.functions.NormalDist.ksP(
        sqrt(col("n1").cast("double") * col("n2").cast("double") /
          (col("n1").cast("double") + col("n2").cast("double"))) *
          col("d_stat")))
  }

  /** `boundingRatio`: the slope of the line between the leftmost and
    * rightmost points of the group — (y at max x − y at min x) /
    * (max x − min x). Endpoint picks are made total with `tie` (the
    * W1 tiebreak discipline: same-x rows resolve deterministically);
    * a degenerate group (max x == min x) yields null. Output:
    * keys :+ (x_lo, x_hi, bounding_ratio). One partial+final
    * aggregate — the struct min/max carries one candidate per group
    * per partition through the map-side combine.
    */
  def boundingRatio(df: DataFrame, keys: Seq[String], x: Column,
      y: Column, tie: Column): DataFrame = {
    val tagged = struct(x.cast("long").as("x"), tie.as("t"),
      y.cast("double").as("y"))
    df.groupBy(keys.map(col): _*)
      .agg(min(tagged).as("__lo"), max(tagged).as("__hi"))
      .select((keys.map(col) ++ Seq(
        col("__lo.x").as("x_lo"), col("__hi.x").as("x_hi"),
        when(col("__hi.x") > col("__lo.x"),
          round((col("__hi.y") - col("__lo.y")) /
            (col("__hi.x") - col("__lo.x")).cast("double"), 6))
          .as("bounding_ratio"))): _*)
  }

  /** A33: Gini coefficient per key — the inequality read a
    * training-data pipeline runs over token budgets, domain masses,
    * and quality scores ("is 1% of the sources carrying 90% of the
    * tokens?"). Standard rank form over ascending values:
    *
    *   G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx),  i = 1..n
    *
    * over the NONNEGATIVE fixed-point w = floor(v·10^scale) (negative
    * values have no Gini; such rows drop, as do null/NaN). Rank ties
    * are harmless by construction — equal w values contribute the
    * same Σi·w whatever order the window assigns them — so the per-key
    * sort needs no tiebreak and is engine-portable. Both sums are
    * exact DECIMAL(38,0); the closing ratio is one fixed double tree,
    * round-6; keys with zero mass yield null.
    *
    * Scale: ONE keys exchange + per-key sort (inherent to the exact
    * rank statistic — the A16b exact-quantile cost), the rank window
    * and the closing partial+final aggregate riding that single sort.
    */
  def gini(df: DataFrame, keys: Seq[String], value: Column,
      scale: Int = 2): DataFrame = {
    val factor = math.pow(10.0, scale)
    val base = df
      .where(value.isNotNull && !isnan(value.cast("double")))
      .withColumn("__w",
        floor(value.cast("double") * lit(factor)).cast("decimal(38,0)"))
      .where(col("__w") >= 0)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__w"))
    val n = col("n_rows").cast("double")
    val s = col("__s").cast("double")
    base
      .withColumn("__i", row_number().over(w).cast("decimal(38,0)"))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__w")).as("__s"),
        sum(col("__i") * col("__w")).as("__si"))
      .select((keys.map(col) ++ Seq(
        col("n_rows"),
        when(col("__s") > 0,
          round((lit(2.0) * col("__si").cast("double") -
            (n + 1.0) * s) / (n * s), 6)).as("gini"))): _*)
  }

  /** A34: corrMatrix — ClickHouse's pairwise-correlation aggregate
    * over an array column's leading `dims` positions per key: the
    * feature-redundancy read over embedding dimensions or per-doc
    * feature vectors. Emitted EXPLODED as (keys, i, j, corr) for
    * i ≤ j (the upper triangle; the diagonal is 1 wherever the
    * dimension varies) rather than a nested array-of-arrays, so the
    * result filters/joins directly.
    *
    * The A17 exact-sufficient-statistics discipline: elements enter
    * as the fixed-point w = floor(v·10^6) (float→double is exact, the
    * product is one deterministic IEEE op, floor lands on an
    * integer), the five sums (n, Σx, Σy, Σxy, Σx², Σy²) accumulate as
    * exact DECIMALs, and r derives through one fixed double tree,
    * round-6; degenerate variance yields null. Rows whose array is
    * null, shorter than `dims`, or carries a null/NaN element inside
    * the leading `dims` positions drop WHOLE (the moments `!isnan`
    * convention): a NaN element would floor-cast to a null decimal
    * that count() still counts while the power sums skip — n would
    * silently desync from the sufficient statistics. Complete-row
    * semantics also keep n identical across every (i, j) pair of a
    * key, so the matrix is internally consistent.
    *
    * Shape: the pair grid is built INSIDE one projection
    * (dims·(dims+1)/2 structs per row, a Generate below the
    * aggregate), then ONE (keys, i, j) partial+final hash aggregate —
    * raw volume reaches one shuffle carrying pair-grid partial sums.
    */
  def corrMatrix(df: DataFrame, keys: Seq[String], arr: Column,
      dims: Int): DataFrame = {
    require(dims >= 1 && dims <= 64, s"dims must be in [1, 64]: $dims")
    val wAt = (i: Column) =>
      floor(element_at(arr, (i + 1).cast("int")).cast("double") *
        lit(1000000.0)).cast("decimal(38,0)")
    val pairs = flatten(transform(sequence(lit(0), lit(dims - 1)), i =>
      transform(sequence(i, lit(dims - 1)), j =>
        struct(i.cast("long").as("i"), j.cast("long").as("j"),
          wAt(i).as("x"), wAt(j).as("y")))))
    val exploded = df
      .where(arr.isNotNull && size(arr) >= dims &&
        forall(slice(arr, 1, dims),
          e => e.isNotNull && !isnan(e.cast("double"))))
      .select((keys.map(col) :+ explode(pairs).as("__p")): _*)
      .select((keys.map(col) ++ Seq(col("__p.i").as("i"),
        col("__p.j").as("j"), col("__p.x").as("__x"),
        col("__p.y").as("__y"))): _*)
    val n = col("__n").cast("double")
    val (sx, sy) = (col("__sx").cast("double"), col("__sy").cast("double"))
    val (sxy, sxx, syy) = (col("__sxy").cast("double"),
      col("__sxx").cast("double"), col("__syy").cast("double"))
    val cov = sxy - sx * sy / n
    val vx = sxx - sx * sx / n
    val vy = syy - sy * sy / n
    exploded
      .groupBy((keys.map(col) ++ Seq(col("i"), col("j"))): _*)
      .agg(count(lit(1)).as("__n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
      .select((keys.map(col) ++ Seq(col("i"), col("j"),
        col("__n").as("n_rows"),
        when(vx > lit(0.0) && vy > lit(0.0),
          round(cov / sqrt(vx * vy), 6)).as("corr"))): _*)
  }

  /** A36: Kruskal–Wallis H test per key — ClickHouse
    * `kruskalWallisTest`: the k-group generalization of
    * [[mannWhitneyUTest]] (does any of k cohorts stochastically
    * dominate?), with the standard tie correction (Kruskal & Wallis
    * 1952):
    *
    *   H  = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1)
    *   H' = H / (1 − ΣT/(N³−N)),   ΣT = Σ_ties(t³−t)
    *
    * Exactness: pooled DOUBLED average ranks (the [[rankCorr]]
    * machinery — 2·rank + peers − 1, an exact integer), so each
    * group's doubled rank sum 2R_g is an exact DECIMAL and
    * R_g²/n_g = (2R_g)²/(4n_g). The tie term folds as the exact
    * per-row Σ(t²−1), the [[mannWhitneyUTest]] identity. The only
    * order-sensitive step — summing the k per-group double terms —
    * is made deterministic by folding them in GROUP-LABEL ORDER
    * (sort_array + aggregate, the W14 fold discipline; the oracle's
    * ordered list_reduce folds the identical tree).
    *
    * Plan: one rank window over the pooled sample per key, one
    * (keys, group) aggregate, one keys aggregate whose collect_list
    * state is GROUP-cardinality (k entries, never rows). Keys with
    * fewer than 2 groups or an all-tied pooled sample (the correction
    * denominator vanishes) yield null H. Output: keys :+ (n_rows,
    * n_groups, h_stat), tie-corrected, round-6.
    */
  def kruskalWallis(df: DataFrame, keys: Seq[String], value: Column,
      group: Column): DataFrame = {
    val base = df.where(value.isNotNull && group.isNotNull)
      .select((keys.map(col) :+ value.as("__v")) :+
        group.cast("string").as("__g"): _*)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__v"))
    val peers = count(lit(1))
      .over(w.rangeBetween(Window.currentRow, Window.currentRow))
    val ranked = base
      .withColumn("__r2",
        (rank().over(w).cast("long") * 2 + peers - 1).cast("decimal(19,0)"))
      .withColumn("__tt",
        peers.cast("decimal(19,0)") * peers.cast("decimal(19,0)") - 1)
    val byGroup = ranked.groupBy((keys.map(col) :+ col("__g")): _*)
      .agg(count(lit(1)).as("__ng"), sum(col("__r2")).as("__rg"))
    val byKey = ranked.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(col("__tt")).as("__ties"))
    // fold Σ (2R_g)²/(4n_g) in group-label order — k-entry state
    val folded = byGroup.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_groups"),
        aggregate(
          sort_array(collect_list(
            struct(col("__g"), col("__ng"), col("__rg")))),
          lit(0.0),
          (acc, e) => acc + e("__rg").cast("double") *
            e("__rg").cast("double") /
            (lit(4.0) * e("__ng").cast("double"))).as("__hsum"))
    val n = col("n_rows").cast("double")
    val h = lit(12.0) / (n * (n + lit(1.0))) * col("__hsum") -
      lit(3.0) * (n + lit(1.0))
    val corr = lit(1.0) -
      col("__ties").cast("double") / (n * n * n - n)
    val ok = col("n_groups") >= 2 && col("n_rows") >= 2 &&
      corr > lit(1e-12)
    // p off the ROUNDED H at df = k−1 (Wilson–Hilferty; H ≥ 0 so the
    // transform is always in domain) — the FDR panel's feed
    val hOut = when(ok, round(h / corr, 6))
    folded.join(byKey, keys)
      .select((keys.map(col) ++ Seq(
        col("n_rows"), col("n_groups"),
        hOut.as("h_stat"))): _*)
      .withColumn("p_approx", graft.functions.NormalDist.chiSqUpperP(
        col("h_stat"), col("n_groups") - lit(1)))
  }

  /** A39: Friedman test per key (Friedman 1937) — the
    * REPEATED-MEASURES k-group rank test: [[kruskalWallis]] asks "do
    * the k cohorts differ?", Friedman asks it when every BLOCK (day,
    * user, benchmark item) scores all k treatments, ranking WITHIN
    * each block so between-block variation cancels:
    *
    *   Q  = 12/(n·k(k+1)) · Σ_j R_j² − 3n(k+1)
    *   Q' = Q / (1 − ΣT/(n·k(k²−1))),  ΣT = Σ_blocks Σ_ties(t³−t)
    *
    * (R_j = treatment j's rank sum over the n blocks; identical
    * rankings in every block give the exact maximum Q = n(k−1) — a
    * spec law.) Input must be one row per (block, treatment) — the
    * aggregated-grid convention; INCOMPLETE blocks (fewer than k
    * treatments) are dropped per the complete-block design, k taken
    * as the per-key distinct treatment count.
    *
    * Exactness: within-block DOUBLED average ranks (exact integers),
    * rank sums exact DECIMAL, the tie term the per-row Σ(t²−1), and
    * the k-term double fold ordered by treatment label (the A36
    * discipline). Plan: two bounded completeness aggregates, one
    * (keys, block) rank window, one (keys, treatment) aggregate, one
    * keys fold with k-entry state. Keys with k < 2 or an all-tied
    * design (C = 0) yield null. Output: keys :+ (n_blocks,
    * n_treatments, q_stat), tie-corrected, round-6.
    */
  def friedman(df: DataFrame, keys: Seq[String], block: Column,
      treatment: Column, value: Column): DataFrame = {
    val base = df
      .where(block.isNotNull && treatment.isNotNull && value.isNotNull)
      .select(((keys.map(col) :+ block.as("__b")) :+
        treatment.cast("string").as("__g")) :+ value.as("__v"): _*)
    val kTab = base.groupBy(keys.map(col): _*)
      .agg(count_distinct(col("__g")).as("__k"))
    val bSize = base.groupBy((keys.map(col) :+ col("__b")): _*)
      .agg(count(lit(1)).as("__bs"))
    val complete = base
      .join(bSize, keys :+ "__b")
      .join(broadcast(kTab), keys)
      .where(col("__bs") === col("__k"))
    val w = Window.partitionBy((keys.map(col) :+ col("__b")): _*)
      .orderBy(col("__v"))
    val peers = count(lit(1))
      .over(w.rangeBetween(Window.currentRow, Window.currentRow))
    val ranked = complete
      .withColumn("__r2",
        (rank().over(w).cast("long") * 2 + peers - 1).cast("decimal(19,0)"))
      .withColumn("__tt",
        peers.cast("decimal(19,0)") * peers.cast("decimal(19,0)") - 1)
    val byTreat = ranked.groupBy((keys.map(col) :+ col("__g")): _*)
      .agg(sum(col("__r2")).as("__rg"))
    val byKey = ranked.groupBy(keys.map(col): _*)
      .agg(count_distinct(col("__b")).as("n_blocks"),
        sum(col("__tt")).as("__ties"), max(col("__k")).as("__kk"))
    val folded = byTreat.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_treatments"),
        aggregate(
          sort_array(collect_list(struct(col("__g"), col("__rg")))),
          lit(0.0),
          (acc, e) => acc + e("__rg").cast("double") *
            e("__rg").cast("double") / lit(4.0)).as("__qsum"))
    val n = col("n_blocks").cast("double")
    val k = col("__kk").cast("double")
    val q = lit(12.0) / (n * k * (k + lit(1.0))) * col("__qsum") -
      lit(3.0) * n * (k + lit(1.0))
    val corr = lit(1.0) - col("__ties").cast("double") /
      (n * k * (k * k - lit(1.0)))
    val ok = col("__kk") >= 2 && col("n_blocks") >= 1 &&
      corr > lit(1e-12)
    val qOut = when(ok, round(q / corr, 6))
    folded.join(byKey, keys)
      .select((keys.map(col) ++ Seq(
        col("n_blocks"), col("n_treatments"),
        qOut.as("q_stat"), col("__kk"))): _*)
      .withColumn("p_approx", graft.functions.NormalDist.chiSqUpperP(
        col("q_stat"), col("__kk") - lit(1)))
      .drop("__kk")
  }

  /** A38: Population Stability Index per key — THE standard
    * distribution-drift statistic a model-serving monitor tracks
    * (credit-scoring practice; the discrete KL symmetrization
    * PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i), current p vs reference q;
    * rule of thumb: < 0.1 stable, > 0.25 action):
    *
    * Binning: `bins` equal-width bins over the REFERENCE cohort's
    * fixed-point [min, max] (the serving convention — the bin edges
    * are frozen by the reference); current-cohort values outside the
    * reference range clamp to the edge bins. Bin assignment is
    * integer arithmetic: floor((w − min)·bins / (max − min + 1)) with
    * every operand an exact integer < 2^53, so the one double
    * division is correctly rounded identically in any engine.
    * Add-one smoothing (the X22 DSIR convention) keeps empty bins
    * finite: p_i = (c_i + 1)/(N + bins). Each bin's term is one fixed
    * double tree rounded to 9 and summed as DECIMAL (the [[entropy]]
    * discipline — order-free). Keys with an empty cohort yield null.
    *
    * Plan: one corpus scan to the (keys, bin, cohort) cell counts
    * (the reference min/max ride a broadcast |keys|-row table);
    * everything after is bin-cardinality. Output: keys :+ (n_ref,
    * n_cur, psi), round-6.
    */
  def psi(df: DataFrame, keys: Seq[String], value: Column,
      isReference: Column, bins: Int, scale: Int = 2): DataFrame = {
    require(bins >= 2 && bins <= 10000, s"bins out of range: $bins")
    val factor = math.pow(10.0, scale)
    val base = df
      .where(value.isNotNull && !isnan(value.cast("double")) &&
        isReference.isNotNull)
      .select((keys.map(col) :+
        floor(value.cast("double") * lit(factor)).cast("long").as("__w")) :+
        isReference.as("__ref"): _*)
    val range = base.where(col("__ref"))
      .groupBy(keys.map(col): _*)
      .agg(min(col("__w")).as("__lo"), max(col("__w")).as("__hi"))
    val binned = base.join(broadcast(range), keys)
      .withColumn("__bin",
        greatest(lit(0L), least(lit(bins - 1L),
          floor((col("__w") - col("__lo")).cast("double") * lit(bins) /
            (col("__hi") - col("__lo") + 1L).cast("double"))
            .cast("long"))))
    val cells = binned
      .groupBy((keys.map(col) :+ col("__bin")): _*)
      .agg(count(when(col("__ref"), lit(1))).as("__cr"),
        count(when(!col("__ref"), lit(1))).as("__cc"))
    val totals = cells.groupBy(keys.map(col): _*)
      .agg(sum(col("__cr")).as("n_ref"), sum(col("__cc")).as("n_cur"))
    // the FULL bin grid per key: a bin empty in both cohorts still
    // carries its smoothed (1+0)-vs-(1+0) term — dropping it would
    // make the sum depend on which bins happened to be observed
    val grid = totals
      .withColumn("__bin", explode(sequence(lit(0L), lit(bins - 1L))))
    val withT = grid.join(cells, keys :+ "__bin", "left")
      .na.fill(0L, Seq("__cr", "__cc"))
    val p = (col("__cc").cast("double") + lit(1.0)) /
      (col("n_cur").cast("double") + lit(bins.toDouble))
    val q = (col("__cr").cast("double") + lit(1.0)) /
      (col("n_ref").cast("double") + lit(bins.toDouble))
    val term = round((p - q) * log(p / q), 9).cast("decimal(28,9)")
    withT
      .withColumn("__t", term)
      .groupBy(keys.map(col): _*)
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        sum(col("__t")).as("__psi"))
      .select((keys.map(col) ++ Seq(
        col("n_ref"), col("n_cur"),
        when(col("n_ref") > 0 && col("n_cur") > 0,
          round(col("__psi").cast("double"), 6)).as("psi"))): _*)
  }

  /** A37: Jarque–Bera normality test per key (Jarque & Bera 1980) —
    * the closing member of the distribution-shape family, computed
    * directly off [[moments]]' exact fixed-point power sums:
    *
    *   JB = n/6 · (g1² + (g2 − 3)²/4)
    *
    * with g1 = m3/m2^1.5 (population skewness) and g2 = m4/m2²
    * (population kurtosis) — large JB rejects normality. SHARES
    * [[moments]]' power-sum aggregate and double tree (via
    * centralMoments), so it inherits the same DECIMAL(38) bound:
    * n·w⁴ must fit — scale 2 and |v| ≤ 10⁵ allows ~10⁹ rows per
    * group, silent null on overflow. Keys with vanishing variance
    * yield null. Output: keys :+ (n_rows, skew_pop, kurt_pop,
    * jb_stat), round-6.
    */
  def jarqueBera(df: DataFrame, keys: Seq[String], value: Column,
      scale: Int = 2): DataFrame = {
    val (out, _, m2, m3, m4) = centralMoments(df, keys, value, scale)
    val n = col("n_rows").cast("double")
    val g1 = m3 / sqrt(m2 * m2 * m2)
    val g2 = m4 / (m2 * m2)
    val jb = n / lit(6.0) *
      (g1 * g1 + (g2 - lit(3.0)) * (g2 - lit(3.0)) / lit(4.0))
    val ok = m2 > lit(1e-12)
    val jbOut = when(ok, round(jb, 6))
    out.select((keys.map(col) ++ Seq(
      col("n_rows"),
      when(ok, round(g1, 6)).as("skew_pop"),
      when(ok, round(g2, 6)).as("kurt_pop"),
      jbOut.as("jb_stat"))): _*)
      .withColumn("p_approx", graft.functions.NormalDist.chiSqUpperP(
        col("jb_stat"), lit(2)))
  }

  /** A40: Benjamini–Hochberg FDR adjustment across a hypothesis panel
    * (Benjamini & Hochberg 1995, "Controlling the false discovery
    * rate"): one input row per hypothesis with its p-value, output the
    * ADJUSTED q-value
    *
    *   q_(i) = min_{j ≥ i} ( m · p_(j) / j ),  clamped at 1
    *
    * (p_(1) ≤ … ≤ p_(m) the sorted panel) — the step-up rule's
    * adjusted values, so "alarm where q ≤ α" bounds the expected
    * false-discovery PROPORTION at α across the panel. The test
    * family this engine now ships (Welch/Student/meanZ, Mann–Whitney,
    * Kruskal–Wallis, Friedman, Jarque–Bera, Mann–Kendall, PSI, CUSUM,
    * paired t, ANOVA) makes per-key alarming need this: at 10⁵
    * monitored keys, per-key α = 0.05 expects 5 000 false alarms; BH
    * caps the rate instead.
    *
    * Determinism: rank ties on p break by `tie` (the O3 total-order
    * rule), each arithmetic step is one double op over the round-6 p
    * feed the driver gate already proves bit-identical, and the
    * running min is order-free — so the q grid is engine-exact.
    * Null-p rows drop (a degenerate upstream test is not a
    * hypothesis).
    *
    * Scale: hypotheses are TEST OUTPUTS (|keys|-cardinality, never
    * raw volume) — one window sort per family over panel-sized rows.
    * `family` is the correction scope (e.g. one metric's keys);
    * Seq.empty corrects one global panel (single-partition window —
    * fine at panel size, by construction ≪ data size). Output:
    * family :+ (tie, p_value, bh_rank, q_value), q round-6.
    *
    * `storeyLambda = Some(λ)` enables the Storey 2002 q-value variant
    * ("A direct approach to false discovery rates", JRSS-B): BH's
    * π₀ = 1 is replaced by the λ-plugin estimate π̂₀ = #{p > λ} /
    * (m(1−λ)) clamped to [1/m, 1], and the output gains a round-6
    * `pi0` column before q_value.
    */
  /** A43 — winsorized + trimmed robust statistics: the data-cleaning
    * standard (clip or drop the tails at exact per-group percentiles
    * before averaging) that makes a mean usable on heavy-tailed
    * telemetry; the robust companion of A16's exact percentiles and
    * W16's MAD z-score.
    *
    * Percentiles come from the exact `percentile` aggregate (the
    * q_percentiles gate-proven face) ROUNDED to the 6-dp grid before
    * any comparison — without that rounding a boundary row could
    * classify differently across engines on a last-ulp percentile
    * difference. Clipped/kept values then ride the exact
    * DECIMAL(24,6) grid, so all downstream sums are order-free and
    * the mean/stddev trees are fixed double ops (round-6).
    *
    * Output per key: n, n_lo / n_hi (clipped-below/above counts),
    * win_mean, win_std (population, winsorized), trim_mean (mean of
    * rows inside the CLOSED fence interval [plo, phi] — boundary rows
    * are kept, matching the inclusive clip).
    *
    * Domain guard: a fence whose rounded magnitude reaches 1e9 would
    * overflow the DECIMAL(15,6) grid — Spark nulls the sum silently
    * while DuckDB errors, a divergent failure mode. Groups with such
    * fences emit NULL stats on BOTH engines via an explicit fence-ok
    * predicate that also gates the decimal cast itself (so the
    * oracle never evaluates the overflowing cast).
    *
    * 100 TB: two passes — one percentile aggregate (the exact
    * percentile is a sort-based aggregate; at real scale swap in the
    * KLL face if approximate fences suffice), one broadcast-join of
    * the keys-sized fence table + a plain aggregate. No shuffle
    * carries raw values twice.
    */
  def winsorizedStats(df: DataFrame, keys: Seq[String], value: Column,
      lo: Double, hi: Double): DataFrame = {
    require(lo < hi, "lo fence must be below hi")
    val rows = df.select((keys.map(col) :+ value.cast("double").as("__v")): _*)
      .where(col("__v").isNotNull && !isnan(col("__v")))
    val fences = rows.groupBy(keys.map(col): _*)
      .agg(expr(s"percentile(__v, array(${lo}D, ${hi}D))").as("__pq"))
      .select((keys.map(col) ++ Seq(
        round(element_at(col("__pq"), 1), 6).as("__plo"),
        round(element_at(col("__pq"), 2), 6).as("__phi"))): _*)
    val joined = rows.join(broadcast(fences), keys)
    // DECIMAL(15,6): 9 integer digits hold any clipped telemetry value
    // while keeping the square's precision (31,12) inside 38 — and the
    // (38,12) product sums are NEVER downscale-cast (Spark rounds
    // HALF_UP where DuckDB truncates; full scale → double avoids the
    // divergence). Fences at |1e9|+ would overflow the grid: gate the
    // cast so neither engine ever evaluates it (DuckDB would error).
    val fok = abs(col("__plo")) < lit(1e9) && abs(col("__phi")) < lit(1e9)
    val clipped = when(fok,
      least(greatest(col("__v"), col("__plo")), col("__phi")))
      .cast("decimal(15,6)")
    val inside = col("__v") >= col("__plo") && col("__v") <= col("__phi")
    val agg = joined.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(when(col("__v") < col("__plo"), 1L).otherwise(0L)).as("n_lo"),
      sum(when(col("__v") > col("__phi"), 1L).otherwise(0L)).as("n_hi"),
      max(fok).as("__fok"),
      sum(clipped).cast("double").as("__s"),
      sum(clipped * clipped).cast("double").as("__s2"),
      // inside the fences the clipped value IS the raw value
      sum(when(inside, clipped)).cast("double").as("__ts"),
      sum(when(inside, 1L).otherwise(0L)).as("__tn"))
    val nD = col("n").cast("double")
    agg.select(
      (keys.map(col) :+ col("n")) ++ Seq(
        col("n_lo"), col("n_hi"),
        when(col("__fok"), round(col("__s") / nD, 6)).as("win_mean"),
        when(col("__fok"), round(sqrt(greatest(lit(0.0),
          (col("__s2") - col("__s") * col("__s") / nD) / nD)), 6))
          .as("win_std"),
        when(col("__fok") && col("__tn") > 0,
          round(col("__ts") / col("__tn").cast("double"), 6))
          .as("trim_mean")): _*)
  }

  /** A44 — Kaplan–Meier survival estimator (Kaplan & Meier 1958):
    * the nonparametric retention/survival curve with right-censoring
    * done correctly — the lifetime read the W9 retention matrix can't
    * give ("what FRACTION of users survive past t, counting users
    * still alive as censored, not churned"). Product-analytics
    * standard; also the training-run lens for "how long do documents
    * survive in the dedup/curation funnel".
    *
    * Input: one row per subject with (duration, event) where event=1
    * is an observed terminal event and 0 right-censoring. Per key
    * group and distinct duration t (ascending): n_risk(t) = subjects
    * with duration >= t, d(t) = events AT t; the curve is
    * S(t) = Π_{u<=t, d(u)>0} (1 − d(u)/n_risk(u)), computed as
    * exp(Σ ln(1 − d/n)) so the running product is one window SUM over
    * a fixed double log tree (round-6, engine-mirrorable — DuckDB's
    * `product()` aggregate would be a different tree). Censor-only
    * times still appear (risk-set bookkeeping rows with S carried).
    *
    * Scale shape: one subject-level aggregate (duration, event per
    * subject), then all arithmetic on the (keys × distinct-duration)
    * GRID — the W12 grid posture: raw events pay one pass, the curve
    * costs grid-sized windows.
    */
  def kaplanMeier(df: DataFrame, keys: Seq[String], duration: Column,
      event: Column): DataFrame = {
    val withRisk = kmRiskGrid(df, keys, duration, event)
    val wCum = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withRisk
      .withColumn("survival",
        when(kmDeadCum(wCum) === 1, lit(0.0))
          .otherwise(round(exp(sum(kmLogTerm).over(wCum)), 6)))
      .select((keys.map(col) ++ Seq(col("__t").as("t"), col("n_risk"),
        col("d"), (col("__n") - col("d")).as("censored"),
        col("survival"))): _*)
  }

  /** The shared A44/A44b risk grid: one subject-level aggregate onto
    * (keys × distinct duration), then n_risk as exact integer running
    * sums. n_risk(t) = total − (subjects with duration < t).
    */
  private def kmRiskGrid(df: DataFrame, keys: Seq[String],
      duration: Column, event: Column): DataFrame = {
    val rows = df.select(
      (keys.map(col) ++ Seq(duration.cast("long").as("__t"),
        event.cast("int").as("__e"))): _*)
      .where(col("__t").isNotNull && col("__t") >= 0 && col("__e").isNotNull)
    val grid = rows.groupBy((keys.map(col) :+ col("__t")): _*)
      .agg(count(lit(1)).as("__n"),
        sum(col("__e")).cast("long").as("d"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"))
    grid
      .withColumn("__total",
        sum(col("__n")).over(Window.partitionBy(keys.map(col): _*)))
      .withColumn("__before",
        coalesce(sum(col("__n")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_risk", col("__total") - col("__before"))
  }

  // d = n_risk (the whole risk set dies) is handled by an explicit
  // zero branch: Spark's `log` returns NULL at 0 where DuckDB's
  // `ln` returns -inf, so the factor-of-zero case must never enter
  // the log tree on either engine
  private def kmLogTerm: Column =
    when(col("d") > 0 && col("d") < col("n_risk"),
      log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double")))
      .otherwise(lit(0.0))

  private def kmDeadCum(wCum: org.apache.spark.sql.expressions.WindowSpec)
      : Column =
    max(when(col("d") === col("n_risk"), 1).otherwise(0)).over(wCum)

  /** A44b — Kaplan–Meier with Greenwood confidence bands (Greenwood
    * 1926, the formula every survival dashboard draws):
    * Var(Ŝ(t)) = Ŝ(t)² · Σ_{u≤t} d/(n·(n−d)), the variance sum one
    * more running window over the SAME risk grid as [[kaplanMeier]].
    * The band is the plain (linear) 95% interval Ŝ ± z·SE clamped to
    * [0, 1], z = 1.959964.
    *
    * Determinism: the variance sum is a running double sum over the
    * window's forced t-order (sequential on both engines, like the
    * log tree); SE and the band derive from the UNROUNDED survival
    * and variance through one fixed tree, round-6 at the edge. After
    * the curve hits zero (d = n_risk) the variance is undefined —
    * se/lo/hi are NULL there on both engines, survival pinned 0.
    */
  def kaplanMeierCi(df: DataFrame, keys: Seq[String], duration: Column,
      event: Column, z: Double = 1.959964): DataFrame = {
    val withRisk = kmRiskGrid(df, keys, duration, event)
    val wCum = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gterm = when(col("d") > 0 && col("d") < col("n_risk"),
      col("d").cast("double") / (col("n_risk").cast("double") *
        (col("n_risk") - col("d")).cast("double")))
      .otherwise(lit(0.0))
    val sRaw = exp(sum(kmLogTerm).over(wCum))
    val seRaw = sRaw * sqrt(sum(gterm).over(wCum))
    val alive = kmDeadCum(wCum) =!= 1
    withRisk
      .withColumn("survival",
        when(alive, round(sRaw, 6)).otherwise(lit(0.0)))
      .withColumn("se", when(alive, round(seRaw, 6)))
      .withColumn("ci_lo",
        when(alive, round(greatest(lit(0.0), sRaw - lit(z) * seRaw), 6)))
      .withColumn("ci_hi",
        when(alive, round(least(lit(1.0), sRaw + lit(z) * seRaw), 6)))
      .select((keys.map(col) ++ Seq(col("__t").as("t"), col("n_risk"),
        col("d"), (col("__n") - col("d")).as("censored"),
        col("survival"), col("se"), col("ci_lo"), col("ci_hi"))): _*)
  }

  /** A45 — log-rank (Mantel–Cox) test: the significance companion to
    * [[kaplanMeier]], exactly as Mann–Kendall is to Theil–Sen — "are
    * these two cohorts' survival curves the same?" under the
    * hypergeometric null at each event time. O1 − E1 accumulates the
    * observed-minus-expected group-1 events over event times; the
    * statistic (O1−E1)²/V is χ²(1), p via the shared Wilson–Hilferty
    * tree ([[graft.functions.NormalDist.chiSqUpperP]], df = 1 —
    * where it reduces to the exact normal tail).
    *
    * Numeric discipline: risk sets are exact integer running sums on
    * the (keys × distinct-duration) grid; the per-time E and V terms
    * are rationals of those integers quantized to the 9-dp grid
    * before DECIMAL summation (order-free), so the statistic is one
    * fixed double tree over exact sums — oracle-able.
    */
  def logRankTest(df: DataFrame, keys: Seq[String], duration: Column,
      event: Column, group: Column): DataFrame =
    weightedLogRank(df, keys, duration, event, group, gehan = false)

  /** A45b — Gehan–Breslow–Wilcoxon: the log-rank family member that
    * weights each event time by the TOTAL AT RISK n_t, making the
    * verdict sensitive to EARLY separation (log-rank weights all
    * times equally, so late-tail noise can drown an early treatment
    * effect — the generalized-Wilcoxon answer every survival package
    * ships beside log-rank). Same grid, same hypergeometric E/V,
    * terms scaled by n_t (and n_t² for the variance); the weighted
    * observed count Σ n_t·d1_t stays an exact integer sum.
    */
  def gehanWilcoxonTest(df: DataFrame, keys: Seq[String],
      duration: Column, event: Column, group: Column): DataFrame =
    weightedLogRank(df, keys, duration, event, group, gehan = true)

  private def weightedLogRank(df: DataFrame, keys: Seq[String],
      duration: Column, event: Column, group: Column,
      gehan: Boolean): DataFrame = {
    val rows = df.select(
      (keys.map(col) ++ Seq(duration.cast("long").as("__t"),
        event.cast("int").as("__e"),
        group.cast("int").as("__g"))): _*)
      .where(col("__t").isNotNull && col("__t") >= 0 &&
        col("__e").isNotNull && col("__g").isNotNull)
    val grid = rows.groupBy((keys.map(col) :+ col("__t")): _*)
      .agg(count(lit(1)).as("__m"),
        sum(col("__g")).cast("long").as("__m1"),
        sum(col("__e")).cast("long").as("d"),
        sum(col("__g") * col("__e")).cast("long").as("d1"))
    val wAll = Window.partitionBy(keys.map(col): _*)
    val wBefore = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withRisk = grid
      .withColumn("__ntot", sum(col("__m")).over(wAll))
      .withColumn("__n1tot", sum(col("__m1")).over(wAll))
      .withColumn("__nb", coalesce(sum(col("__m")).over(wBefore), lit(0L)))
      .withColumn("__n1b", coalesce(sum(col("__m1")).over(wBefore), lit(0L)))
      .withColumn("__n", col("__ntot") - col("__nb"))
      .withColumn("__n1", col("__n1tot") - col("__n1b"))
    val dd = col("d").cast("double")
    val nd = col("__n").cast("double")
    val n1d = col("__n1").cast("double")
    // Gehan weights w = n_t (w² in the variance); log-rank w = 1.
    // The weight factors multiply OUTSIDE the round-9 quantization's
    // operand so the unweighted trees stay token-identical to r19's
    val (wE, wV) = if (gehan) (nd, nd * nd) else (lit(1.0), lit(1.0))
    val termE = when(col("d") > 0, round(wE * (dd * (n1d / nd)), 9))
      .otherwise(lit(0.0)).cast("decimal(30,9)")
    val termV = when(col("d") > 0 && col("__n") > 1,
      round(wV * (dd * (n1d / nd) * (lit(1.0) - n1d / nd) *
        ((nd - dd) / (nd - lit(1.0)))), 9))
      .otherwise(lit(0.0)).cast("decimal(30,9)")
    val o1Term =
      if (gehan) sum(col("__n") * col("d1")).cast("long")
      else sum(col("d1")).cast("long")
    val agg = withRisk.groupBy(keys.map(col): _*).agg(
      max(col("__ntot")).as("n_subjects"),
      max(col("__n1tot")).as("n1_subjects"),
      o1Term.as("o1"),
      sum(termE).cast("double").as("__e1"),
      sum(termV).cast("double").as("__v"))
    val chi2 = when(col("__v") > lit(1e-12),
      round((col("o1").cast("double") - col("__e1")) *
        (col("o1").cast("double") - col("__e1")) / col("__v"), 6))
    agg.select((keys.map(col) ++ Seq(
      col("n_subjects"), col("n1_subjects"), col("o1"),
      round(col("__e1"), 6).as("e1"),
      chi2.as("chi2"))): _*)
      // p off the ROUNDED statistic (the library-wide rule), df = 1
      .withColumn("p_approx", graft.functions.NormalDist.chiSqUpperP(
        col("chi2"), lit(1)))
  }

  /** A46 — Cox proportional hazards with one BINARY covariate (Cox
    * 1972, Breslow ties): the MODEL completing the survival family —
    * A44 draws the curves, A45 answers "different?", this estimates
    * HOW different: β is the log hazard ratio of cohort 1 vs 0, with
    * a Wald z and two-sided p.
    *
    * With a binary covariate the partial likelihood collapses onto
    * the SAME risk-set grid as the log-rank test: the at-risk
    * exp-sum is n0_t + n1_t·e^β, so each Newton step needs only
    * per-time rationals of the integer risk counts and the current
    * per-key β —
    *   U(β) = O1 − Σ_t d_t·n1_t e^β/(n0_t + n1_t e^β)
    *   I(β) = Σ_t d_t·n1_t e^β·n0_t/(n0_t + n1_t e^β)²
    *   β ← β + U/I.
    * A FIXED iteration count (3 steps from β = 0 — where U reduces to
    * the log-rank O1−E1) makes the whole fit a finite dataflow, so
    * the DuckDB oracle replays it as unrolled stages and the driver
    * gate value-checks the LEARNED hazard ratio (`q_coxph`) — the
    * X29 discipline applied to survival modeling. Per-step U/I terms
    * are quantized to the 9-dp grid before DECIMAL summation
    * (order-free); β/U/I live per KEY as columns (no driver loop at
    * all — iterations are three chained grid-aggregate + broadcast
    * joins).
    *
    * Output per key: n_subjects, o1, beta (log HR), hazard_ratio,
    * se, z, p_value (shared normal tree off the rounded z).
    */
  def coxPh(df: DataFrame, keys: Seq[String], duration: Column,
      event: Column, group: Column, iters: Int = 3): DataFrame = {
    val rows = df.select(
      (keys.map(col) ++ Seq(duration.cast("long").as("__t"),
        event.cast("int").as("__e"),
        group.cast("int").as("__g"))): _*)
      .where(col("__t").isNotNull && col("__t") >= 0 &&
        col("__e").isNotNull && col("__g").isNotNull)
    val grid = rows.groupBy((keys.map(col) :+ col("__t")): _*)
      .agg(count(lit(1)).as("__m"),
        sum(col("__g")).cast("long").as("__m1"),
        sum(col("__e")).cast("long").as("d"),
        sum(col("__g") * col("__e")).cast("long").as("d1"))
    val wAll = Window.partitionBy(keys.map(col): _*)
    val wBefore = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val g2 = grid
      .withColumn("__ntot", sum(col("__m")).over(wAll))
      .withColumn("__n1tot", sum(col("__m1")).over(wAll))
      .withColumn("__n1",
        col("__n1tot") - coalesce(sum(col("__m1")).over(wBefore), lit(0L)))
      .withColumn("__n0",
        (col("__ntot") - coalesce(sum(col("__m")).over(wBefore), lit(0L))) -
          col("__n1"))
      .select((keys.map(col) ++ Seq(col("__t"), col("d"), col("d1"),
        col("__n0"), col("__n1"), col("__ntot"))): _*)
    // per-key constants: O1 and subject counts
    val consts = g2.groupBy(keys.map(col): _*).agg(
      max(col("__ntot")).as("n_subjects"),
      sum(col("d1")).cast("long").as("o1"))
    // β per key, iterated as a column — start at 0
    var beta = consts.select((keys.map(col) :+
      lit(0.0).as("__beta")): _*)
    val dd = col("d").cast("double")
    val n0d = col("__n0").cast("double")
    val n1d = col("__n1").cast("double")
    for (_ <- 0 until iters) {
      val joined = g2.join(broadcast(beta), keys)
      val eb = exp(col("__beta"))
      val denom = n0d + n1d * eb
      val termU = when(col("d") > 0,
        round(dd * (n1d * eb / denom), 9)).otherwise(lit(0.0))
        .cast("decimal(20,9)")
      val termI = when(col("d") > 0,
        round(dd * (n1d * eb * n0d) / (denom * denom), 9))
        .otherwise(lit(0.0)).cast("decimal(20,9)")
      val step = joined.groupBy(keys.map(col): _*).agg(
        first(col("__beta")).as("__b0"),
        sum(termU).cast("double").as("__su"),
        sum(termI).cast("double").as("__i"))
        .join(broadcast(consts.select((keys.map(col) :+ col("o1")): _*)), keys)
      beta = step.select((keys.map(col) :+
        when(col("__i") > lit(1e-12),
          col("__b0") + (col("o1").cast("double") - col("__su")) / col("__i"))
          .otherwise(col("__b0")).as("__beta")): _*)
    }
    // final information at the fitted β for the Wald se
    val fin = g2.join(broadcast(beta), keys)
    val ebF = exp(col("__beta"))
    val denomF = n0d + n1d * ebF
    val termIF = when(col("d") > 0,
      round(dd * (n1d * ebF * n0d) / (denomF * denomF), 9))
      .otherwise(lit(0.0)).cast("decimal(20,9)")
    val info = fin.groupBy(keys.map(col): _*).agg(
      first(col("__beta")).as("__beta"),
      sum(termIF).cast("double").as("__iF"))
    val ok = col("__iF") > lit(1e-12)
    val zr = when(ok, round(col("__beta") * sqrt(col("__iF")), 6))
    consts.join(info, keys).select(
      (keys.map(col) ++ Seq(col("n_subjects"), col("o1"),
        when(ok, round(col("__beta"), 6)).as("beta"),
        when(ok, round(exp(col("__beta")), 6)).as("hazard_ratio"),
        when(ok, round(lit(1.0) / sqrt(col("__iF")), 6)).as("se"),
        zr.as("z"))): _*)
      .withColumn("p_value", graft.functions.NormalDist.twoSidedP(col("z")))
  }

  /** A44c — Nelson–Aalen cumulative hazard (Nelson 1972, Aalen 1978):
    * Ĥ(t) = Σ_{u≤t} d/n_risk on the SAME risk grid as [[kaplanMeier]],
    * with its variance Σ d/n² and the Fleming–Harrington survival
    * Ŝ_FH = e^(−Ĥ) — the estimator preferred over KM in small risk
    * sets and the additive face a hazard dashboard plots directly.
    * One grid pass + two more running window sums; every term is a
    * rational of exact integers through a fixed double tree (round-6),
    * the window's forced t-order makes the running double sums
    * deterministic (the A44 argument).
    */
  def nelsonAalen(df: DataFrame, keys: Seq[String], duration: Column,
      event: Column): DataFrame = {
    val withRisk = kmRiskGrid(df, keys, duration, event)
    val wCum = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hTerm = when(col("d") > 0,
      col("d").cast("double") / col("n_risk").cast("double"))
      .otherwise(lit(0.0))
    val vTerm = when(col("d") > 0,
      col("d").cast("double") / (col("n_risk").cast("double") *
        col("n_risk").cast("double"))).otherwise(lit(0.0))
    val h = sum(hTerm).over(wCum)
    withRisk
      .withColumn("cum_hazard", round(h, 6))
      .withColumn("hazard_var", round(sum(vTerm).over(wCum), 6))
      .withColumn("survival_fh", round(exp(-h), 6))
      .select((keys.map(col) ++ Seq(col("__t").as("t"), col("n_risk"),
        col("d"), (col("__n") - col("d")).as("censored"),
        col("cum_hazard"), col("hazard_var"), col("survival_fh"))): _*)
  }

  /** A46b — Cox proportional hazards with MULTIPLE covariates
    * (Cox 1972, Breslow ties): the model real retention analyses fit
    * — the hazard ratio of the treatment flag ADJUSTED for activity
    * tier, tenure bucket, etc. Where [[coxPh]]'s binary covariate
    * collapses every risk set to two counts, general covariates need
    * the risk-set moment sums
    *   S0(t) = Σ_{dur≥t} e^{βᵀx},  S1_k(t) = Σ x_k e^{βᵀx},
    *   S2_kl(t) = Σ x_k x_l e^{βᵀx}
    * — computed NOT per risk set but as reverse cumulative window
    * sums of per-duration aggregates (the A44 grid posture: subjects
    * pay one narrow aggregate pass per Newton iteration, everything
    * else is grid-sized). Score U_k = Σ_t [Σ_{events at t} x_k −
    * d·S1_k/S0]; information I_kl = Σ_t d·(S2_kl/S0 −
    * (S1_k/S0)(S1_l/S0)); Newton β += I⁻¹U, `iters` FIXED steps from
    * 0 — the finite dataflow that makes the LEARNED coefficients
    * value-oracle-able (the q_coxph/X29 discipline).
    *
    * Determinism: per-subject weight terms are 9-dp-quantized before
    * DECIMAL summation (order-free), the reverse cumsums are exact
    * DECIMAL window sums, per-time U/I contributions re-quantize to
    * the 9-dp grid, and β itself is rounded to 9 dp after each
    * update. For p = 2 the solve is the explicit 2×2 Cramer tree
    * (pure Column arithmetic, mirrored token-for-token by the
    * oracle); for p ≥ 3 it is Gaussian elimination with partial
    * pivoting on keys-sized rows ([[Regression.linearFit]]'s
    * pattern; spec-gated — a p×p CASE ladder is not worth the SQL).
    *
    * Output per key: n_subjects, n_events, then per covariate k:
    * beta_k, hr_k, se_k (Wald, from diag I⁻¹ at the fitted β), z_k,
    * p_k (shared normal tree).
    *
    * 100 TB: each iteration is one broadcast join (keys-sized β) +
    * one map-side-combined aggregate over subjects onto the (keys ×
    * distinct-duration) grid + grid-sized windows; p is tens at
    * most, so the 1 + p + p(p+1)/2 sum columns stay narrow.
    */
  def coxPhMulti(df: DataFrame, keys: Seq[String], duration: Column,
      event: Column, features: Seq[Column], iters: Int = 3): DataFrame = {
    val p = features.size
    require(p >= 2, "coxPhMulti needs >= 2 covariates; use coxPh for one")
    val pairs = for (i <- 0 until p; j <- i until p) yield (i, j)
    val featCols = features.zipWithIndex.map {
      case (f, i) => f.cast("double").as(s"__x$i")
    }
    val rows = df.select(
      (keys.map(col) ++ Seq(duration.cast("long").as("__t"),
        event.cast("int").as("__e")) ++ featCols): _*)
      .where(col("__t").isNotNull && col("__t") >= 0 && col("__e").isNotNull)
    // β-independent grid: events + event-covariate sums per duration
    val grid = rows.groupBy((keys.map(col) :+ col("__t")): _*).agg(
      count(lit(1)).as("__m"),
      (sum(col("__e")).cast("long").as("d") +:
        (0 until p).map(i =>
          sum((col("__e") * col(s"__x$i")).cast("decimal(20,9)"))
            .cast("decimal(38,9)").as(s"__sxe$i"))): _*)
    val consts = grid.groupBy(keys.map(col): _*).agg(
      sum(col("__m")).cast("long").as("n_subjects"),
      sum(col("d")).cast("long").as("n_events"))
    val r9d = (c: Column) => round(c, 9).cast("decimal(30,9)")
    // one U/I evaluation at the β carried by `beta` (a keys-sized
    // frame with __b0..__b{p-1}): subjects pay ONE aggregate pass,
    // risk sums are reverse cumulative DECIMAL windows on the grid.
    // The __b columns are CARRIED through both aggregates as extra
    // group keys (they are functional on `keys` — grouping sets and
    // aggregate values are unchanged), so the output holds (keys, β,
    // U, I) in one frame and the Newton step needs NO second
    // broadcast(beta) join. That keeps the chained plan LINEAR in the
    // iteration count: the previous step(ui(β) ⋈ β) embedded β twice
    // and the registered 3-iteration queries planned at 502 Exchanges
    // / 188 scans / 6837 formatted-plan lines (r21 measurement —
    // exchange reuse deduped the runtime work, but analysis/optimizer
    // time on the doubled tree dominated the wall; guide §3.3 "very
    // large plans: planning time itself can become the bottleneck").
    def ui(beta: DataFrame): DataFrame = {
      val bCols = (0 until p).map(i => col(s"__b$i"))
      val joined = rows.join(broadcast(beta), keys)
      val w = exp((0 until p).map(i => col(s"__b$i") * col(s"__x$i"))
        .reduce(_ + _))
      val perT = joined.groupBy(
        ((keys.map(col) :+ col("__t")) ++ bCols): _*).agg(
        sum(r9d(w)).cast("decimal(38,9)").as("__a0"),
        ((0 until p).map(i =>
          sum(r9d(col(s"__x$i") * w)).cast("decimal(38,9)").as(s"__af$i")) ++
          pairs.map { case (i, j) =>
            sum(r9d(col(s"__x$i") * col(s"__x$j") * w))
              .cast("decimal(38,9)").as(s"__ap${i}_$j")
          }): _*)
      val wTail = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val riskCols = ("__a0" +: ((0 until p).map(i => s"__af$i") ++
        pairs.map { case (i, j) => s"__ap${i}_$j" })).map(c =>
        sum(col(c)).over(wTail).cast("double")
          .as(s"__s${c.stripPrefix("__a")}"))
      val withRisk = perT.join(grid, (keys :+ "__t").toSeq)
        .select((keys.map(col) ++ Seq(col("__t"), col("d")) ++ bCols ++
          (0 until p).map(i => col(s"__sxe$i").cast("double").as(s"__sxe$i")) ++
          riskCols): _*)
      val dd = col("d").cast("double")
      val s0 = col("__s0")
      val tU = (0 until p).map { i =>
        when(col("d") > 0,
          round(col(s"__sxe$i") - dd * (col(s"__sf$i") / s0), 9))
          .otherwise(lit(0.0)).cast("decimal(20,9)")
      }
      val tI = pairs.zipWithIndex.map { case ((i, j), k) =>
        when(col("d") > 0,
          round(dd * (col(s"__sp${i}_$j") / s0 -
            (col(s"__sf$i") / s0) * (col(s"__sf$j") / s0)), 9))
          .otherwise(lit(0.0)).cast("decimal(20,9)")
      }
      withRisk.groupBy((keys.map(col) ++ bCols): _*).agg(
        sum(tU(0)).cast("double").as("__u0"),
        ((1 until p).map(i => sum(tU(i)).cast("double").as(s"__u$i")) ++
          pairs.zipWithIndex.map { case ((i, j), k) =>
            sum(tI(k)).cast("double").as(s"__i${i}_$j")
          }): _*)
    }
    // Newton update from a joined (U, I, β) keys-sized frame
    def step(uib: DataFrame): DataFrame =
      if (p == 2) {
        // explicit 2×2 Cramer tree — mirrored token-for-token by the
        // q_coxph_multi oracle stages
        val det = col("__i0_0") * col("__i1_1") -
          col("__i0_1") * col("__i0_1")
        val ok = det > lit(1e-12) && col("__i0_0") > lit(0.0)
        uib.select((keys.map(col) ++ Seq(
          when(ok, round(col("__b0") +
            (col("__u0") * col("__i1_1") - col("__i0_1") * col("__u1")) / det,
            9)).otherwise(col("__b0")).as("__b0"),
          when(ok, round(col("__b1") +
            (col("__i0_0") * col("__u1") - col("__u0") * col("__i0_1")) / det,
            9)).otherwise(col("__b1")).as("__b1"))): _*)
      } else if (p == 3) {
        // explicit symmetric 3×3 adjugate tree — also oracle-
        // mirrorable, so the p = 3 model rides the value gate too
        val (a, b, c) = (col("__i0_0"), col("__i0_1"), col("__i0_2"))
        val (d, e, f) = (col("__i1_1"), col("__i1_2"), col("__i2_2"))
        val det = a * (d * f - e * e) - b * (b * f - c * e) +
          c * (b * e - d * c)
        val ok = det > lit(1e-12) && a > lit(0.0)
        val adj = cox3Adjugate(a, b, c, d, e, f)
        val nums = Seq(
          adj(0) * col("__u0") + adj(1) * col("__u1") + adj(2) * col("__u2"),
          adj(1) * col("__u0") + adj(3) * col("__u1") + adj(4) * col("__u2"),
          adj(2) * col("__u0") + adj(4) * col("__u1") + adj(5) * col("__u2"))
        uib.select((keys.map(col) ++ nums.zipWithIndex.map {
          case (num, i) =>
            when(ok, round(col(s"__b$i") + num / det, 9))
              .otherwise(col(s"__b$i")).as(s"__b$i")
        }): _*)
      } else {
        // p ≥ 4: Gaussian elimination with partial pivoting on the
        // keys-sized aggregate (Regression.linearFit's pattern)
        val iArr = array(pairs.map { case (i, j) => col(s"__i${i}_$j") }: _*)
        val uArr = array((0 until p).map(i => col(s"__u$i")): _*)
        val bArr = array((0 until p).map(i => col(s"__b$i")): _*)
        val stepUdf = udf { (iFlat: Seq[Double], u: Seq[Double],
            b: Seq[Double]) =>
          gaussSolve(iFlat, u) match {
            case Some(delta) =>
              b.zip(delta).map { case (bi, di) =>
                BigDecimal(bi + di).setScale(9,
                  BigDecimal.RoundingMode.HALF_UP).toDouble
              }
            case None => b
          }
        }
        uib.select((keys.map(col) :+ stepUdf(iArr, uArr, bArr).as("__bs")): _*)
          .select((keys.map(col) ++ (0 until p).map(i =>
            element_at(col("__bs"), i + 1).as(s"__b$i"))): _*)
      }
    var beta = consts.select(
      (keys.map(col) ++ (0 until p).map(i => lit(0.0).as(s"__b$i"))): _*)
    for (_ <- 0 until iters)
      beta = step(ui(beta))
    // Wald se from diag(I⁻¹) at the fitted β (carried through ui)
    val fin = ui(beta)
    val withSe =
      if (p == 2) {
        val det = col("__i0_0") * col("__i1_1") -
          col("__i0_1") * col("__i0_1")
        val ok = det > lit(1e-12) && col("__i0_0") > lit(0.0)
        fin.select((keys.map(col) ++
          (0 until p).map(i => col(s"__b$i")) ++ Seq(
            when(ok, sqrt(col("__i1_1") / det)).as("__se0"),
            when(ok, sqrt(col("__i0_0") / det)).as("__se1"))): _*)
      } else if (p == 3) {
        val (a, b, c) = (col("__i0_0"), col("__i0_1"), col("__i0_2"))
        val (d, e, f) = (col("__i1_1"), col("__i1_2"), col("__i2_2"))
        val det = a * (d * f - e * e) - b * (b * f - c * e) +
          c * (b * e - d * c)
        val ok = det > lit(1e-12) && a > lit(0.0)
        val adj = cox3Adjugate(a, b, c, d, e, f)
        fin.select((keys.map(col) ++
          (0 until p).map(i => col(s"__b$i")) ++ Seq(
            when(ok, sqrt(adj(0) / det)).as("__se0"),
            when(ok, sqrt(adj(3) / det)).as("__se1"),
            when(ok, sqrt(adj(5) / det)).as("__se2"))): _*)
      } else {
        val iArr = array(pairs.map { case (i, j) => col(s"__i${i}_$j") }: _*)
        val diagUdf = udf { (iFlat: Seq[Double]) => invDiag(iFlat) }
        fin.select((keys.map(col) ++
          (0 until p).map(i => col(s"__b$i")) :+
          diagUdf(iArr).as("__vd")): _*)
          .select((keys.map(col) ++
            (0 until p).map(i => col(s"__b$i")) ++
            (0 until p).map(i =>
              when(element_at(col("__vd"), i + 1).isNotNull,
                sqrt(element_at(col("__vd"), i + 1))).as(s"__se$i"))): _*)
      }
    val out = consts.join(withSe, keys)
    val statCols = (0 until p).flatMap { i =>
      val ok = col(s"__se$i").isNotNull && col(s"__se$i") > lit(0.0)
      val zc = when(ok, round(col(s"__b$i") / col(s"__se$i"), 6))
      Seq(
        when(ok, round(col(s"__b$i"), 6)).as(s"beta$i"),
        when(ok, round(exp(col(s"__b$i")), 6)).as(s"hr$i"),
        when(ok, round(col(s"__se$i"), 6)).as(s"se$i"),
        zc.as(s"z$i"))
    }
    val withStats = out.select((keys.map(col) ++
      Seq(col("n_subjects"), col("n_events")) ++ statCols): _*)
    (0 until p).foldLeft(withStats) { (d2, i) =>
      d2.withColumn(s"p$i",
        graft.functions.NormalDist.twoSidedP(col(s"z$i")))
    }
  }

  /** Adjugate entries of the symmetric 3×3 [[a,b,c],[b,d,e],[c,e,f]]
    * in upper-triangle order (A00, A01, A02, A11, A12, A22) — shared
    * by the A46b Newton step and the Wald diagonal so the oracle
    * mirrors ONE tree.
    */
  private def cox3Adjugate(a: Column, b: Column, c: Column, d: Column,
      e: Column, f: Column): Seq[Column] = Seq(
    d * f - e * e,
    -(b * f - c * e),
    b * e - d * c,
    a * f - c * c,
    -(a * e - b * c),
    a * d - b * b)

  /** Gaussian elimination with partial pivoting over an upper-triangle
    * flattened symmetric matrix — solve A·x = u; None when singular.
    */
  private def gaussSolve(aFlat: Seq[Double], u: Seq[Double])
      : Option[Seq[Double]] = {
    val m = u.size
    val a = Array.ofDim[Double](m, m + 1)
    var idx = 0
    for (i <- 0 until m; j <- i until m) {
      a(i)(j) = aFlat(idx); a(j)(i) = aFlat(idx); idx += 1
    }
    for (i <- 0 until m) a(i)(m) = u(i)
    var singular = false
    for (c <- 0 until m if !singular) {
      var piv = c
      for (r <- c + 1 until m)
        if (math.abs(a(r)(c)) > math.abs(a(piv)(c))) piv = r
      if (math.abs(a(piv)(c)) < 1e-12) singular = true
      else {
        if (piv != c) { val t = a(piv); a(piv) = a(c); a(c) = t }
        for (r <- c + 1 until m) {
          val f = a(r)(c) / a(c)(c)
          for (k <- c to m) a(r)(k) -= f * a(c)(k)
        }
      }
    }
    if (singular) None
    else {
      val x = new Array[Double](m)
      for (i <- (m - 1) to 0 by -1) {
        var s = a(i)(m)
        for (k <- i + 1 until m) s -= a(i)(k) * x(k)
        x(i) = s / a(i)(i)
      }
      Some(x.toSeq)
    }
  }

  /** Diagonal of the inverse of an upper-triangle flattened symmetric
    * matrix (solve A·x = e_k per column); null marks singular.
    */
  private def invDiag(aFlat: Seq[Double]): Option[Seq[Double]] = {
    val m = ((math.sqrt(8.0 * aFlat.size + 1) - 1) / 2).round.toInt
    val diag = (0 until m).map { k =>
      val e = Seq.tabulate(m)(i => if (i == k) 1.0 else 0.0)
      gaussSolve(aFlat, e).map(_(k))
    }
    if (diag.exists(_.isEmpty)) None else Some(diag.map(_.get))
  }

  /** A40c — Benjamini–Yekutieli 2001 FDR: BH's q-values inflated by
    * the harmonic factor c(m) = Σ_{j≤m} 1/j, the correction that
    * keeps FDR control under ARBITRARY dependence between the
    * hypotheses (BH assumes positive regression dependence — false
    * for many correlated-metric panels). c(m) is computed as an
    * exact order-free DECIMAL sum of 9-dp-quantized 1/j terms over an
    * exploded 1..m sequence (panel-sized — never data-sized), joined
    * back keys-sized; q = min(1, c(m)·BH-tail-min). Output adds a
    * round-6 `cm` column.
    */
  def fdrAdjustBY(df: DataFrame, family: Seq[String], p: Column,
      tie: Column): DataFrame = {
    val fam = family.map(col)
    val base = df.where(p.isNotNull)
      .select((fam :+ tie.as("tie")) :+ p.cast("double").as("p_value"): _*)
    val wOrd = Window.partitionBy(fam: _*)
      .orderBy(col("p_value").asc, col("tie").asc)
    val wAll = Window.partitionBy(fam: _*)
    val tailMin = min(col("p_value") * col("__m").cast("double") /
      col("bh_rank").cast("double"))
      .over(wOrd.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val ranked = base
      .withColumn("__m", count(lit(1)).over(wAll))
      .withColumn("bh_rank", row_number().over(wOrd).cast("long"))
    val cmTbl = base.groupBy(fam: _*).agg(count(lit(1)).as("__mm"))
      .withColumn("__j", explode(sequence(lit(1L), col("__mm"))))
      .groupBy(fam: _*).agg(
        sum(round(lit(1.0) / col("__j").cast("double"), 9)
          .cast("decimal(20,9)")).cast("double").as("__cm"))
    val joined =
      if (family.isEmpty) ranked.crossJoin(broadcast(cmTbl))
      else ranked.join(broadcast(cmTbl), family)
    joined
      .withColumn("cm", round(col("__cm"), 6))
      .withColumn("q_value",
        round(least(lit(1.0), col("__cm") * tailMin), 6))
      .drop("__m", "__cm")
  }

  def fdrAdjust(df: DataFrame, family: Seq[String], p: Column,
      tie: Column, storeyLambda: Option[Double] = None): DataFrame = {
    val fam = family.map(col)
    val base = df.where(p.isNotNull)
      .select((fam :+ tie.as("tie")) :+ p.cast("double").as("p_value"): _*)
    val wOrd = Window.partitionBy(fam: _*)
      .orderBy(col("p_value").asc, col("tie").asc)
    val wAll = Window.partitionBy(fam: _*)
    val tailMin = min(col("p_value") * col("__m").cast("double") /
      col("bh_rank").cast("double"))
      .over(wOrd.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val ranked = base
      .withColumn("__m", count(lit(1)).over(wAll))
      .withColumn("bh_rank", row_number().over(wOrd).cast("long"))
    storeyLambda match {
      case None =>
        ranked
          .withColumn("q_value", round(least(lit(1.0), tailMin), 6))
          .drop("__m")
      case Some(lam) =>
        // Storey 2002 λ-plugin: π̂₀ = #{p > λ} / (m·(1−λ)), clamped to
        // [1/m, 1] — BH assumes every hypothesis is null (π₀ = 1);
        // when many keys genuinely drift, the plugin sharpens q by the
        // estimated null fraction. One extra panel-sized window sum;
        // q = min(1, π̂₀ · tail-min) with the UNROUNDED π̂₀ inside the
        // product (the oracle mirrors the same tree; π̂₀'s own output
        // column is round-6 like every reported statistic).
        val pi0 = least(lit(1.0), greatest(
          lit(1.0) / col("__m").cast("double"),
          sum(when(col("p_value") > lam, 1L).otherwise(0L)).over(wAll)
            .cast("double") / (col("__m").cast("double") * lit(1.0 - lam))))
        ranked
          .withColumn("__pi0", pi0)
          .withColumn("pi0", round(col("__pi0"), 6))
          .withColumn("q_value",
            round(least(lit(1.0), col("__pi0") * tailMin), 6))
          .drop("__m", "__pi0")
    }
  }
}
