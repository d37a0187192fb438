package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The fitted PCA model — small driver-side state (dim·(k+1) doubles),
  * broadcast into [[Pca.project]] as literals.
  *
  * `components(c)(d)`: the c-th principal axis (rows ordered by
  * eigenvalue, descending), sign-normalized so each axis's
  * largest-|entry| coordinate is positive (eigenvectors are defined
  * up to sign; the normalization makes the model deterministic).
  * `eigenvalues(c)`: the variance along axis c.
  */
final case class PcaModel(dim: Int, n: Long, mean: Array[Double],
    eigenvalues: Array[Double], components: Array[Array[Double]])

/** X26: PCA over an embedding column — the dimensionality-reduction /
  * whitening step of a large-scale embedding pipeline (dedup and ANN
  * indexes run faster and cluster better on decorrelated, truncated
  * vectors; OpenAI's and Cohere's published embedding-compression
  * recipes are exactly truncate-after-rotation).
  *
  * [[fit]] is one distributed pass + a bounded driver step:
  *   1. the dim·(dim+1)/2 upper-triangle second moments Σ x_i·x_j and
  *      the dim first moments Σ x_i accumulate in ONE aggregation
  *      (every product is an exact float→double multiply, summed as
  *      DECIMAL — the corrMatrix discipline, so the covariance matrix
  *      is bit-deterministic across runs and partitionings);
  *   2. the dim×dim covariance eigendecomposes on the DRIVER with
  *      cyclic Jacobi sweeps (deterministic fixed sweep order,
  *      convergence to off-diagonal ≤ 1e-12·‖C‖ — the matrix is
  *      dim²·8 bytes, KBs at embedding dims: an index-build control
  *      structure, same class as trainCentroids' codebook).
  *
  * [[project]] is map-only and codegen'd: component c of a row is
  * dot(v, comp_c) − dot(mean, comp_c), the second term a precomputed
  * scalar — so centering costs NOTHING per row and the k dots ride
  * the same [[VectorFns.dot]] codegen expression as every retrieval
  * scan (components are cast to float once, driver-side; the
  * per-component center constant is accumulated in the identical
  * left-to-right double order as the codegen'd dot, so a scalar
  * reference reproduces the output bit-for-bit — spec-pinned).
  * `whiten = true` scales each component by 1/√λ (unit variance —
  * the SemDeDup/clustering preprocessing convention).
  *
  * Scale: the fit pass is |D|·dim²/2 narrow rows into a
  * dim²-cell partial agg (map-side combine bounds the shuffle at
  * dim² rows per partition); projection is one codegen scan. Not
  * SQL-expressible (the eigendecomposition) ⇒ spec-gated like X25,
  * with the registered query under the driver's rows-only check.
  */
object Pca {

  /** Half-away-from-zero quantization of a double expression onto the
    * 1e-12 grid WITHOUT per-row BigDecimal — pure floor arithmetic
    * (the r20 finding: `round()`/decimal casts route every row through
    * java BigDecimal and were 93% of q_pca_project's cost; this tree
    * is 13× faster at identical determinism).
    */
  private def quant12(c: Column): Column = {
    val s = c * lit(1e12)
    when(s >= 0, floor(s + lit(0.5)))
      .otherwise(-floor(-s + lit(0.5))).cast("long")
  }

  def fit(df: DataFrame, vec: String, k: Int,
      sweeps: Int = 30): PcaModel = {
    val dim = df.select(size(col(vec))).head.getInt(0)
    require(k >= 1 && k <= dim, s"k must be in [1, $dim]: $k")
    // one pass: pair products of the exploded vector against itself
    // (j >= i), plus the first moments riding the j == i rows.
    // Exactness discipline: each float×float product is EXACT in
    // double (24+24 mantissa bits), quantized per-row onto the 1e-12
    // grid ([[quant12]] — a deterministic function of the row alone),
    // then summed as LONGS split on 2^30 (arithmetic shift = floor
    // division and mask = nonnegative remainder for BOTH signs, so
    // hi·2^30 + lo reconstructs exactly): order-free integer sums ⇒
    // the moments are bit-deterministic across runs and
    // partitionings, overflow-safe to ~8.6e9 rows per cell, and two
    // orders of magnitude cheaper than the former per-row decimal
    // casts. Reconstruction to exact decimals happens driver-side on
    // the dim²/2-row collect.
    val mask = (1L << 30) - 1
    val pairs = df
      .select(col(vec).as("__v"),
        posexplode(col(vec)).as(Seq("__i", "__xi")))
      .select(col("__i"), col("__xi"),
        posexplode(col("__v")).as(Seq("__j", "__xj")))
      .where(col("__j") >= col("__i"))
      .select(col("__i"), col("__j"),
        quant12(col("__xi").cast("double") * col("__xj").cast("double"))
          .as("__q"),
        when(col("__j") === col("__i"),
          quant12(col("__xi").cast("double"))).otherwise(lit(0L)).as("__qx"))
    val moments = pairs
      .groupBy(col("__i"), col("__j"))
      .agg(
        sum(col("__q").bitwiseAND(lit(mask))).as("__qlo"),
        sum(shiftright(col("__q"), 30)).as("__qhi"),
        sum(col("__qx").bitwiseAND(lit(mask))).as("__xlo"),
        sum(shiftright(col("__qx"), 30)).as("__xhi"),
        count(lit(1)).as("__n"))
      .collect()
    val n = moments.find(r => r.getInt(0) == 0 && r.getInt(1) == 0)
      .map(_.getLong(6)).getOrElse(0L)
    require(n >= 2, s"PCA needs at least 2 rows, got $n")
    val nD = n.toDouble
    // exact driver-side reconstruction: (Σhi)·2^30 + Σlo on the
    // 1e-12 grid, one BigDecimal per matrix cell (dim²/2 of them)
    def rebuild(lo: Long, hi: Long): Double =
      ((BigDecimal(hi) * BigDecimal(1L << 30) + BigDecimal(lo)) /
        BigDecimal(1000000000000L)).toDouble
    val sxx = Array.ofDim[Double](dim, dim)
    val mean = Array.ofDim[Double](dim)
    moments.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val s = rebuild(r.getLong(2), r.getLong(3))
      sxx(i)(j) = s; sxx(j)(i) = s
      if (i == j) mean(i) = rebuild(r.getLong(4), r.getLong(5)) / nD
    }
    // covariance (population form, the spectral object): C_ij =
    // Sxx_ij/n − μ_i·μ_j — fixed double tree over exact sums
    val cov = Array.tabulate(dim, dim)((i, j) =>
      sxx(i)(j) / nD - mean(i) * mean(j))
    val (vals, vecs) = jacobiEigen(cov, sweeps)
    val order = vals.zipWithIndex.sortBy { case (v, i) => (-v, i) }
      .map(_._2).take(k)
    val comps = order.map { c =>
      val axis = Array.tabulate(dim)(d => vecs(d)(c))
      // sign normalization: largest-|entry| coordinate positive
      val m = axis.indices.maxBy(d => (math.abs(axis(d)), -d))
      if (axis(m) < 0.0) axis.map(x => -x) else axis
    }
    PcaModel(dim, n, mean, order.map(vals), comps)
  }

  /** Append `outCol`: the k-dim projection (array<double>) of `vec`
    * onto the model's principal axes; `whiten` scales each component
    * to unit variance.
    */
  def project(df: DataFrame, vec: String, model: PcaModel,
      outCol: String = "pca", whiten: Boolean = false): DataFrame = {
    val exprs = model.components.zipWithIndex.map { case (axis, c) =>
      val axisF = axis.map(_.toFloat)
      // the center constant, accumulated EXACTLY like the codegen'd
      // dot (left-to-right double adds over float-cast components)
      var center = 0.0
      var d = 0
      while (d < model.dim) {
        center += model.mean(d) * axisF(d).toDouble; d += 1 }
      val raw = VectorFns.dot(col(vec), typedLit(axisF.toSeq)) - lit(center)
      if (whiten) raw / lit(math.sqrt(model.eigenvalues(c))) else raw
    }
    df.withColumn(outCol, array(exprs: _*))
  }

  /** Deterministic cyclic Jacobi eigendecomposition of a symmetric
    * matrix: fixed (p, q) sweep order, rotation formulas per Golub &
    * Van Loan §8.5. Returns (eigenvalues, V) with eigenvector c in
    * column c of V. Driver-side by design — the input is dim×dim.
    */
  private[graft] def jacobiEigen(c0: Array[Array[Double]],
      sweeps: Int = 30): (Array[Double], Array[Array[Double]]) = {
    val n = c0.length
    val a = c0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      for (i <- 0 until n; j <- 0 until n if i != j) s += a(i)(j) * a(i)(j)
      math.sqrt(s)
    }
    val scale = math.max(1e-300, {
      var s = 0.0
      for (i <- 0 until n; j <- 0 until n) s += a(i)(j) * a(i)(j)
      math.sqrt(s)
    })
    var sweep = 0
    while (sweep < sweeps && off() > 1e-12 * scale) {
      for (p <- 0 until n - 1; q <- p + 1 until n
           if math.abs(a(p)(q)) > 1e-300) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val sign = if (theta >= 0.0) 1.0 else -1.0
        val t = sign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val cs = 1.0 / math.sqrt(t * t + 1.0)
        val sn = t * cs
        for (i <- 0 until n) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = cs * aip - sn * aiq
          a(i)(q) = sn * aip + cs * aiq
        }
        for (j <- 0 until n) {
          val apj = a(p)(j); val aqj = a(q)(j)
          a(p)(j) = cs * apj - sn * aqj
          a(q)(j) = sn * apj + cs * aqj
        }
        for (i <- 0 until n) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = cs * vip - sn * viq
          v(i)(q) = sn * vip + cs * viq
        }
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }
}
