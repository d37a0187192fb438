package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

/** X26: PCA fit/project laws — known spectra, planted axes,
  * orthonormality, bit-determinism, scalar-reference projection
  * parity, whitening variance.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("X26 jacobiEigen: known 2x2 spectrum and eigenvectors") {
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12)
    assert(math.abs(sorted(1) - 3.0) < 1e-12)
    // eigenvector for 3 is (1,1)/sqrt(2) up to sign
    val c3 = if (vals(0) > vals(1)) 0 else 1
    val v3 = Array(vecs(0)(c3), vecs(1)(c3))
    assert(math.abs(math.abs(v3(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(v3(0) - v3(1)) < 1e-12 ||
      math.abs(v3(0) + v3(1)) < 1e-12)
  }

  private def planted = (0 until 400).map { i =>
    (i.toLong, Seq.tabulate(8) { d =>
      if (d == 0) (3.0 * math.sin(i * 0.37)).toFloat
      else if (d == 1) math.cos(i * 0.71).toFloat
      else 0.0f
    })
  }.toDF("vec_id", "embedding")

  test("X26 fit: planted axes recovered in order, components orthonormal, model bit-deterministic") {
    val m = Pca.fit(planted, "embedding", k = 2)
    assert(m.n == 400L && m.dim == 8)
    // variance order: the 3x-amplitude axis first
    assert(m.eigenvalues(0) > m.eigenvalues(1) &&
      m.eigenvalues(1) > 0.0)
    // axes recovered: component 0 is ±e0, component 1 is ±e1 — and
    // sign normalization makes the dominant coordinate positive
    assert(m.components(0)(0) > 0.999, m.components(0).toSeq.toString)
    assert(m.components(1)(1) > 0.999, m.components(1).toSeq.toString)
    // orthonormal
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(m.components(0), m.components(0)) - 1.0) < 1e-9)
    assert(math.abs(dot(m.components(1), m.components(1)) - 1.0) < 1e-9)
    assert(math.abs(dot(m.components(0), m.components(1))) < 1e-9)
    // eigenvalues match the planted population variances (3·sin and
    // cos lattices over 400 points)
    val xs = (0 until 400).map(i => 3.0 * math.sin(i * 0.37).toFloat)
    val popVar = {
      val mu = xs.sum / xs.size
      xs.map(x => (x - mu) * (x - mu)).sum / xs.size
    }
    assert(math.abs(m.eigenvalues(0) - popVar) < 1e-3,
      s"${m.eigenvalues(0)} vs $popVar")
    // bit-determinism: DECIMAL-exact moments + fixed Jacobi order
    val m2 = Pca.fit(planted.repartition(7), "embedding", k = 2)
    assert(m.mean.toSeq == m2.mean.toSeq)
    assert(m.eigenvalues.toSeq == m2.eigenvalues.toSeq)
    assert(m.components.map(_.toSeq).toSeq ==
      m2.components.map(_.toSeq).toSeq)
  }

  test("X26 project: scalar-reference bit parity; whitened components have unit variance") {
    val m = Pca.fit(planted, "embedding", k = 2)
    val out = Pca.project(planted, "embedding", m)
      .select(col("vec_id"), col("embedding"), col("pca"))
      .as[(Long, Seq[Float], Seq[Double])].collect()
    // scalar reference: identical float casts, identical
    // left-to-right double accumulation, identical center constant
    for ((_, v, p) <- out; c <- 0 until 2) {
      val axisF = m.components(c).map(_.toFloat)
      var dot = 0.0
      var center = 0.0
      for (d <- 0 until m.dim) {
        dot += v(d).toDouble * axisF(d).toDouble
        center += m.mean(d) * axisF(d).toDouble
      }
      assert(p(c) === dot - center, s"component $c")
    }
    // whitened: population variance of each kept component is 1
    val w = Pca.project(planted, "embedding", m, whiten = true)
      .select(col("pca")).as[Seq[Double]].collect()
    for (c <- 0 until 2) {
      val xs = w.map(_(c))
      val mu = xs.sum / xs.length
      val pv = xs.map(x => (x - mu) * (x - mu)).sum / xs.length
      assert(math.abs(pv - 1.0) < 1e-3, s"component $c variance $pv")
    }
  }
}
