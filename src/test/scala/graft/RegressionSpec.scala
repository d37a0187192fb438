package graft

import graft.operators.Regression
import org.apache.spark.sql.functions._

/** A42 exact OLS laws: planted-coefficient recovery, the singular
  * guard, general-p ≡ Cramer at p=2, partition-order independence
  * (the DECIMAL-sum discipline's whole point), and the predict face.
  */
class RegressionSpec extends SparkSpec {
  import spark.implicits._

  // noiseless plane: y = 3 + 2·x1 − 0.5·x2 on a non-degenerate grid
  private def plane = for {
    x1 <- 0 to 9; x2 <- 0 to 9
  } yield ("g", x1.toDouble, x2.toDouble, 3.0 + 2.0 * x1 - 0.5 * x2)

  // noisy fixture: deterministic pseudo-noise on the 0.01 grid so
  // the DECIMAL(18,2) quantization is exact
  private def noisy = for {
    x1 <- 0 to 19; x2 <- 0 to 11
  } yield ("g", x1.toDouble, x2.toDouble,
    1.5 + 0.75 * x1 + 0.25 * x2 + ((x1 * 7 + x2 * 13) % 10 - 4.5) / 10.0)

  test("A42: linearFit2 recovers planted coefficients exactly; r2 = 1, rmse = 0") {
    val df = plane.toDF("k", "x1", "x2", "y")
    val row = Regression.linearFit2(df, Seq("k"), col("x1"), col("x2"), col("y"))
      .as[(String, Long, Double, Double, Double, Double, Double)]
      .collect().head
    assert(row === (("g", 100L, 3.0, 2.0, -0.5, 1.0, 0.0)))
  }

  test("A42: collinear design trips the singular guard to nulls") {
    // x2 = 2·x1 exactly — the normal matrix is rank-deficient
    val df = (0 to 30).map(i => ("g", i.toDouble, 2.0 * i, 1.0 + i))
      .toDF("k", "x1", "x2", "y")
    val row = Regression.linearFit2(df, Seq("k"), col("x1"), col("x2"), col("y"))
      .select("beta0", "beta1", "beta2", "r2", "rmse")
      .as[(Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().head
    assert(row === ((None, None, None, None, None)))
  }

  test("A42: general-p Gaussian elimination matches the Cramer face at p=2") {
    val df = noisy.toDF("k", "x1", "x2", "y")
    val cramer = Regression.linearFit2(df, Seq("k"),
      col("x1"), col("x2"), col("y"))
      .select("beta0", "beta1", "beta2", "r2", "rmse")
      .as[(Double, Double, Double, Double, Double)].collect().head
    val gauss = Regression.linearFit(df, Seq("k"),
      Seq(col("x1"), col("x2")), col("y"))
      .select(col("betas")(0), col("betas")(1), col("betas")(2),
        col("r2"), col("rmse"))
      .as[(Double, Double, Double, Double, Double)].collect().head
    assert(math.abs(cramer._1 - gauss._1) < 1e-6)
    assert(math.abs(cramer._2 - gauss._2) < 1e-6)
    assert(math.abs(cramer._3 - gauss._3) < 1e-6)
    assert(math.abs(cramer._4 - gauss._4) < 1e-6)
    assert(math.abs(cramer._5 - gauss._5) < 1e-6)
  }

  test("A42: general-p recovers a planted 4-feature hyperplane exactly") {
    val rows = for (i <- 0 until 500) yield {
      val x1 = (i % 7).toDouble; val x2 = (i % 11).toDouble
      val x3 = (i % 5).toDouble; val x4 = ((i * 3) % 13).toDouble
      ("g", x1, x2, x3, x4,
        2.0 - 1.5 * x1 + 0.25 * x2 + 4.0 * x3 - 0.75 * x4)
    }
    val df = rows.toDF("k", "x1", "x2", "x3", "x4", "y")
    val got = Regression.linearFit(df, Seq("k"),
      Seq(col("x1"), col("x2"), col("x3"), col("x4")), col("y"))
      .select(col("betas"), col("r2"), col("rmse"))
      .as[(Seq[Double], Double, Double)].collect().head
    assert(got._1 === Seq(2.0, -1.5, 0.25, 4.0, -0.75))
    assert(got._2 === 1.0 && got._3 === 0.0)
  }

  test("A42: fit is partition-order independent (exact DECIMAL sums)") {
    val df = noisy.toDF("k", "x1", "x2", "y")
    def run(d: org.apache.spark.sql.DataFrame) =
      Regression.linearFit2(d, Seq("k"), col("x1"), col("x2"), col("y"))
        .as[(String, Long, Double, Double, Double, Double, Double)]
        .collect().head
    assert(run(df.repartition(13)) === run(df.coalesce(1)))
  }

  test("A42: predict2 residuals are exactly zero on the noiseless plane") {
    val df = plane.toDF("k", "x1", "x2", "y")
    val fit = Regression.linearFit2(df, Seq("k"),
      col("x1"), col("x2"), col("y"))
    val res = Regression.predict2(df, fit, Seq("k"),
      col("x1"), col("x2"), col("y"))
      .agg(max(abs(col("residual"))), count(lit(1)))
      .as[(Double, Long)].collect().head
    assert(res === ((0.0, 100L)))
  }

  test("A42: groups below p+2 rows or with zero variance fit null, others unaffected") {
    val df = (plane.map { case (_, a, b, y) => ("ok", a, b, y) } ++
      Seq(("tiny", 1.0, 2.0, 3.0), ("tiny", 2.0, 3.0, 4.0)) ++
      (0 to 9).map(i => ("const", 5.0, 5.0, i.toDouble)))
      .toDF("k", "x1", "x2", "y")
    val got = Regression.linearFit2(df, Seq("k"),
      col("x1"), col("x2"), col("y"))
      .select(col("k"), col("beta1").isNull)
      .as[(String, Boolean)].collect().toMap
    assert(got === Map("ok" -> false, "tiny" -> true, "const" -> true))
  }
}
