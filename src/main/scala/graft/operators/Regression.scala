package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A42 — multi-feature ordinary least squares, the engine analogue of
  * ClickHouse's `stochasticLinearRegression` fit + predict pair done
  * EXACTLY: OLS over p features reduces to one pass of sufficient
  * statistics (the (p+1)×(p+1) Gram matrix XᵀX and the vector Xᵀy —
  * all plain SUMs with map-side partial aggregation) followed by a
  * keys-sized solve. No gradient schedule, no learning rate, no
  * epoch-order dependence: the normal-equations solution is the
  * unique argmin, so the distributed answer is a deterministic
  * function of the data — the property that makes it oracle-able
  * cross-engine where SGD never is.
  *
  * Two faces:
  *  - [[linearFit2]]: 2 features + intercept through the explicit
  *    Cramer's-rule cofactor tree — every arithmetic step a fixed
  *    double op over exact DECIMAL sums, mirrored literal-for-literal
  *    by the DuckDB oracle (`q_linfit`), round-6 outputs;
  *  - [[linearFit]]: arbitrary p via Gaussian elimination with
  *    partial pivoting over the SAME aggregated sufficient
  *    statistics, run as a scalar function on keys-sized rows (never
  *    a driver collect); spec-pinned to [[linearFit2]] at p=2 and to
  *    exact coefficient recovery on noiseless designs.
  *
  * 100 TB posture: the only pass over raw rows is the sums aggregate
  * — (p+1)(p+4)/2 doubles per key, partial+final combined — so a
  * trillion-row fit shuffles |keys| rows of O(p²) numbers. The solve
  * is O(p³) per key on the aggregated row; p is feature count
  * (tens), never data-sized. This is exactly how the reference
  * family's regression aggregates behave (state = sufficient stats,
  * merge = vector add).
  *
  * Numeric discipline (the q_corr/A16 rule): inputs quantized to
  * DECIMAL(18,2) fixed-point, every product summed as DECIMAL(38,6)
  * so the sums are EXACT integers on the fixed-point grid; doubles
  * enter only in the final solve tree, identical on both engines.
  */
object Regression {

  /** Exact 2-feature OLS (y ~ b0 + b1·x1 + b2·x2) per key group via
    * the explicit 3×3 Cramer cofactor expansion. Outputs n, beta0,
    * beta1, beta2, r2, rmse (round-6; null when the normal matrix is
    * singular on the round-6 grid, e.g. a constant feature).
    */
  def linearFit2(df: DataFrame, keys: Seq[String], x1: Column,
      x2: Column, y: Column): DataFrame =
    fit2FromSums(sums2(df, keys, x1, x2, y), keys)

  /** The 2-feature sufficient-statistics aggregate as a standalone,
    * SUMMABLE state table: (keys, n, s1..syy) with every sum an exact
    * DECIMAL — add two state tables component-wise and you get the
    * state of the concatenated data, bit-exactly. This is what makes
    * the fit streamable ([[graft.streaming.StreamingRegression]]):
    * the store folds batches by DECIMAL addition and the read face
    * runs [[fit2FromSums]] UNCHANGED on the committed state.
    */
  def sums2(df: DataFrame, keys: Seq[String], x1: Column, x2: Column,
      y: Column): DataFrame = {
    val q = (c: Column) => c.cast("decimal(18,2)")
    val prod = (a: Column, b: Column) =>
      sum((a * b).cast("decimal(38,6)")).cast("decimal(38,6)")
    val rows = df.select(
      (keys.map(col) ++ Seq(q(x1).as("__x1"), q(x2).as("__x2"),
        q(y).as("__y"))): _*)
    rows.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col("__x1")).cast("decimal(38,6)").as("s1"),
      sum(col("__x2")).cast("decimal(38,6)").as("s2"),
      sum(col("__y")).cast("decimal(38,6)").as("sy"),
      prod(col("__x1"), col("__x1")).as("s11"),
      prod(col("__x1"), col("__x2")).as("s12"),
      prod(col("__x2"), col("__x2")).as("s22"),
      prod(col("__x1"), col("__y")).as("s1y"),
      prod(col("__x2"), col("__y")).as("s2y"),
      prod(col("__y"), col("__y")).as("syy"))
  }

  /** Component-wise addition of [[sums2]] state tables — the store
    * merge. Exact: DECIMAL sums are associative and commutative.
    */
  def mergeSums2(states: DataFrame, keys: Seq[String]): DataFrame =
    states.groupBy(keys.map(col): _*).agg(
      sum(col("n")).as("n"),
      (Seq("s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y", "syy")
        .map(c => sum(col(c)).cast("decimal(38,6)").as(c))): _*)

  /** The Cramer solve over a [[sums2]] state table — shared verbatim
    * by the batch fit and the streaming store's read face, so batch
    * parity there is structural.
    */
  def fit2FromSums(sumsTable: DataFrame, keys: Seq[String]): DataFrame = {
    val agg = sumsTable.select(
      (keys.map(col) :+ col("n")) ++
        Seq("s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y", "syy")
          .map(c => col(c).cast("double").as(c)): _*)
    val nD = col("n").cast("double")
    // Cramer over A = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]], b =
    // [sy,s1y,s2y] — the cofactor expansions written out once and
    // mirrored token-for-token by the oracle SQL
    val det = nD * (col("s11") * col("s22") - col("s12") * col("s12")) -
      col("s1") * (col("s1") * col("s22") - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s12") - col("s11") * col("s2"))
    val det0 =
      col("sy") * (col("s11") * col("s22") - col("s12") * col("s12")) -
      col("s1") * (col("s1y") * col("s22") - col("s12") * col("s2y")) +
      col("s2") * (col("s1y") * col("s12") - col("s11") * col("s2y"))
    val det1 =
      nD * (col("s1y") * col("s22") - col("s12") * col("s2y")) -
      col("sy") * (col("s1") * col("s22") - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s2y") - col("s1y") * col("s2"))
    val det2 =
      nD * (col("s11") * col("s2y") - col("s1y") * col("s12")) -
      col("s1") * (col("s1") * col("s2y") - col("s1y") * col("s2")) +
      col("sy") * (col("s1") * col("s12") - col("s11") * col("s2"))
    val solvable = abs(det) > lit(1e-6)
    val b0 = det0 / det
    val b1 = det1 / det
    val b2 = det2 / det
    // OLS identity: SSE = Syy − βᵀXᵀy (exact for the true solution);
    // TSS from the same sums; clamps kill round-6 residue and −0.0
    val sse = col("syy") -
      (b0 * col("sy") + b1 * col("s1y") + b2 * col("s2y"))
    val tss = col("syy") - col("sy") * col("sy") / nD
    agg.select(
      (keys.map(col) :+ col("n")) ++ Seq(
        when(solvable, round(b0, 6)).as("beta0"),
        when(solvable, round(b1, 6)).as("beta1"),
        when(solvable, round(b2, 6)).as("beta2"),
        when(solvable && tss > lit(1e-9),
          round(least(lit(1.0), greatest(lit(0.0), lit(1.0) - sse / tss)), 6))
          .as("r2"),
        when(solvable,
          round(sqrt(greatest(lit(0.0), sse) / nD), 6)).as("rmse")): _*)
  }

  /** A42c — ridge (Tikhonov / L2) regression at p = 2: the same
    * Cramer cofactor tree as [[fit2FromSums]] over the normal matrix
    * with λ added to the FEATURE diagonal only (the standard
    * convention — the intercept is not penalized), so the fit shrinks
    * coefficients toward zero and stays solvable on designs OLS finds
    * near-singular (collinear telemetry features — the practical
    * reason a pipeline reaches for ridge). Closed-form ⇒ exactly as
    * deterministic and oracle-able as OLS.
    *
    * Because the ridge solution is NOT the SSE argmin, the OLS
    * shortcut SSE = Syy − βᵀXᵀy does not apply; SSE expands the full
    * quadratic βᵀXᵀXβ − 2βᵀXᵀy + Syy over the same exact sums — one
    * fixed double tree, mirrored by the oracle. r2 reported against
    * the unpenalized TSS (can be below the OLS r2 — shrinkage trades
    * variance for bias; never above it).
    */
  def ridgeFit2(df: DataFrame, keys: Seq[String], x1: Column,
      x2: Column, y: Column, lambda: Double): DataFrame =
    ridgeFit2FromSums(sums2(df, keys, x1, x2, y), keys, lambda)

  def ridgeFit2FromSums(sumsTable: DataFrame, keys: Seq[String],
      lambda: Double): DataFrame = {
    require(lambda >= 0.0, s"lambda must be nonnegative: $lambda")
    val agg = sumsTable.select(
      (keys.map(col) :+ col("n")) ++
        Seq("s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y", "syy")
          .map(c => col(c).cast("double").as(c)): _*)
    val nD = col("n").cast("double")
    val a11 = col("s11") + lit(lambda)
    val a22 = col("s22") + lit(lambda)
    // Cramer over A = [[n,s1,s2],[s1,s11+λ,s12],[s2,s12,s22+λ]]
    val det = nD * (a11 * a22 - col("s12") * col("s12")) -
      col("s1") * (col("s1") * a22 - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s12") - a11 * col("s2"))
    val det0 =
      col("sy") * (a11 * a22 - col("s12") * col("s12")) -
      col("s1") * (col("s1y") * a22 - col("s12") * col("s2y")) +
      col("s2") * (col("s1y") * col("s12") - a11 * col("s2y"))
    val det1 =
      nD * (col("s1y") * a22 - col("s12") * col("s2y")) -
      col("sy") * (col("s1") * a22 - col("s12") * col("s2")) +
      col("s2") * (col("s1") * col("s2y") - col("s1y") * col("s2"))
    val det2 =
      nD * (a11 * col("s2y") - col("s1y") * col("s12")) -
      col("s1") * (col("s1") * col("s2y") - col("s1y") * col("s2")) +
      col("sy") * (col("s1") * col("s12") - a11 * col("s2"))
    val solvable = abs(det) > lit(1e-6)
    val b0 = det0 / det
    val b1 = det1 / det
    val b2 = det2 / det
    // full quadratic: SSE = βᵀXᵀXβ − 2βᵀXᵀy + Syy (the UNPENALIZED
    // Gram — λ lives only in the solve)
    val quad = b0 * b0 * nD + b1 * b1 * col("s11") + b2 * b2 * col("s22") +
      lit(2.0) * b0 * b1 * col("s1") + lit(2.0) * b0 * b2 * col("s2") +
      lit(2.0) * b1 * b2 * col("s12")
    val sse = quad - lit(2.0) *
      (b0 * col("sy") + b1 * col("s1y") + b2 * col("s2y")) + col("syy")
    val tss = col("syy") - col("sy") * col("sy") / nD
    agg.select(
      (keys.map(col) :+ col("n")) ++ Seq(
        when(solvable, round(b0, 6)).as("beta0"),
        when(solvable, round(b1, 6)).as("beta1"),
        when(solvable, round(b2, 6)).as("beta2"),
        when(solvable && tss > lit(1e-9),
          round(least(lit(1.0), greatest(lit(0.0), lit(1.0) - sse / tss)), 6))
          .as("r2"),
        when(solvable,
          round(sqrt(greatest(lit(0.0), sse) / nD), 6)).as("rmse")): _*)
  }

  /** General-p OLS per key group: aggregate the (p+1)-augmented Gram
    * matrix + cross products in ONE pass, then solve the normal
    * equations with Gaussian elimination (partial pivoting) as a
    * scalar function over the keys-sized aggregate — no driver
    * collect anywhere. Output: n, betas (array, intercept first),
    * r2, rmse.
    */
  def linearFit(df: DataFrame, keys: Seq[String], features: Seq[Column],
      y: Column): DataFrame = {
    require(features.nonEmpty, "at least one feature")
    val p = features.size
    val q = (c: Column) => c.cast("decimal(18,2)").cast("double")
    // augmented design: x0 = 1 (intercept), x1..xp = features
    val xs = lit(1.0) +: features.map(q)
    val yq = q(y)
    val gramCols = for (i <- 0 to p; j <- i to p) yield
      sum(xs(i) * xs(j)).as(s"g_${i}_$j")
    val xtyCols = (0 to p).map(i => sum(xs(i) * yq).as(s"b_$i"))
    val agg = df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      (gramCols ++ xtyCols :+ sum(yq * yq).as("syy") :+
        sum(yq).as("sy")): _*)
    val gramArr = array((for (i <- 0 to p; j <- i to p)
      yield col(s"g_${i}_$j")): _*)
    val xtyArr = array((0 to p).map(i => col(s"b_$i")): _*)
    val solveUdf = udf { (gramFlat: Seq[Double], xty: Seq[Double]) =>
      val m = xty.size
      // unpack upper triangle into a full symmetric augmented matrix
      val a = Array.ofDim[Double](m, m + 1)
      var idx = 0
      for (i <- 0 until m; j <- i until m) {
        a(i)(j) = gramFlat(idx); a(j)(i) = gramFlat(idx); idx += 1
      }
      for (i <- 0 until m) a(i)(m) = xty(i)
      // Gaussian elimination with partial pivoting
      var singular = false
      for (c <- 0 until m if !singular) {
        var piv = c
        for (r <- c + 1 until m)
          if (math.abs(a(r)(c)) > math.abs(a(piv)(c))) piv = r
        if (math.abs(a(piv)(c)) < 1e-10) singular = true
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
        val beta = new Array[Double](m)
        for (i <- (m - 1) to 0 by -1) {
          var s = a(i)(m)
          for (k <- i + 1 until m) s -= a(i)(k) * beta(k)
          beta(i) = s / a(i)(i)
        }
        Some(beta.toSeq)
      }
    }
    val withBeta = agg.withColumn("betas", solveUdf(gramArr, xtyArr))
    val nD = col("n").cast("double")
    val sseExpr = col("syy") - aggregate(
      zip_with(col("betas"), xtyArr, (b, v) => b * v),
      lit(0.0), (acc, v) => acc + v)
    val tss = col("syy") - col("sy") * col("sy") / nD
    withBeta.select(
      (keys.map(col) :+ col("n")) ++ Seq(
        transform(col("betas"), b => round(b, 6)).as("betas"),
        when(col("betas").isNotNull && tss > lit(1e-9),
          round(least(lit(1.0), greatest(lit(0.0), lit(1.0) - sseExpr / tss)),
            6)).as("r2"),
        when(col("betas").isNotNull,
          round(sqrt(greatest(lit(0.0), sseExpr) / nD), 6)).as("rmse")): _*)
  }

  /** Scoring face: ŷ = b0 + b1·x1 + b2·x2 from a fitted [[linearFit2]]
    * table joined back on the keys — residual read for drift checks.
    */
  def predict2(df: DataFrame, fit: DataFrame, keys: Seq[String],
      x1: Column, x2: Column, y: Column): DataFrame = {
    val q = (c: Column) => c.cast("decimal(18,2)").cast("double")
    df.select((keys.map(col) ++ Seq(q(x1).as("__x1"), q(x2).as("__x2"),
        q(y).as("__y"))): _*)
      .join(broadcast(fit.select((keys.map(col) ++ Seq(col("beta0"),
        col("beta1"), col("beta2"))): _*)), keys, "inner")
      .withColumn("yhat", round(col("beta0") +
        col("beta1") * col("__x1") + col("beta2") * col("__x2"), 6))
      .withColumn("residual", round(col("__y") - col("yhat"), 6))
      .drop("beta0", "beta1", "beta2", "__x1", "__x2", "__y")
  }
}
