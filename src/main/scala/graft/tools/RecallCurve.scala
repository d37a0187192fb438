package graft.tools

import graft.{ScaleBench, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall-vs-time curve for the IVF serving tier: sweeps
  * (nProbe fraction, Lloyd iters) at a base corpus and an N× derived
  * corpus and prints one line per point — the measurement behind
  * `ivfTopKServing`'s default dials (BASELINE.md records the table).
  *
  * Usage: runMain graft.tools.RecallCurve [baseDir] [factor]
  *
  * Clustered mode (`SPARK_GRAFT_CURVE_CLUSTERED=<nClusters>:<sigma>`,
  * e.g. `256:0.15`): replaces the fixture corpus with a PLANTED
  * Gaussian-ish cluster corpus of the same row count — deterministic
  * sin-based centers and noise, no RNG — and sweeps the same dial.
  * This measures the regime the synthetic weak-structure corpus
  * cannot: how narrow the probe can go when cells match real cluster
  * structure (the r15 finding #4 fixture).
  */
object RecallCurve {

  /** Deterministic planted-cluster corpus: center(c, d) and noise(i, d)
    * are fixed sin lattices — reproducible anywhere, no RNG. Shared by
    * the clustered curve mode and [[ClusteredIvf]].
    */
  def plantedClusters(spark: SparkSession, nRows: Long, nClusters: Int,
      sigma: Double): org.apache.spark.sql.DataFrame =
    spark.range(nRows).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), d =>
        (sin(pmod(col("id"), lit(nClusters.toLong)).cast("double") * 7.3 +
            d.cast("double") * 1.7) +
          lit(sigma) *
            sin(col("id").cast("double") * 0.911 +
              d.cast("double") * 0.377)).cast("float"))
        .as("embedding"))

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (factor <= 1) baseDir
      else ScaleBench.scaledDir(spark, baseDir, factor)
    val fixture = Tables.table(spark, dir, "embeddings")
    val emb = sys.env.get("SPARK_GRAFT_CURVE_CLUSTERED") match {
      case Some(spec) =>
        val Array(ncl, sig) = spec.split(":")
        val nRows = fixture.count()
        System.err.println(
          s"[curve] clustered corpus: $nRows rows, $ncl planted " +
            s"clusters, sigma $sig")
        plantedClusters(spark, nRows, ncl.toInt, sig.toDouble)
      case None => fixture
    }
    val q = emb.filter(col("vec_id") % 20 === 0)
    val n = emb.count()
    val (nl, _) = Similarity.ivfConfigFor(n)
    val brute = Similarity.bruteForceTopK(
      emb, q, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").cache()
    val t0 = System.nanoTime(); brute.count()
    val bruteS = (System.nanoTime() - t0) / 1e9
    val denom = brute.count().toDouble
    System.err.println(f"[curve] $dir n=$n nlist=$nl brute=$bruteS%.2fs")
    // sweep nlist alongside the probe fraction: finer cells cost more
    // assignment (corpus × nlist dots) but probe fewer vectors per
    // query at equal fraction — the trade the serving dial rides
    val nlMuls = sys.env.get("SPARK_GRAFT_CURVE_NLMUL")
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(1))
    val itersSeq = sys.env.get("SPARK_GRAFT_CURVE_ITERS")
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(2, 4))
    // probe fractions in 32nds (defaults ≡ the historical 1/8..1/2
    // sweep); the clustered mode passes narrower numerators, e.g.
    // SPARK_GRAFT_CURVE_NUMS=1,2,4,8,16
    val nums = sys.env.get("SPARK_GRAFT_CURVE_NUMS")
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(4, 8, 12, 16))
    for (m <- nlMuls; iters <- itersSeq; num <- nums) {
      val nlm = nl * m
      val np = math.max(1, nlm * num / 32)
      val t1 = System.nanoTime()
      val got = Similarity.ivfTopKServing(emb, q, "vec_id", "embedding",
        k = 10, nlist = nlm, nProbe = np, iters = iters)
        .select("query_id", "neighbor_id")
      val hits = got.intersect(brute).count()
      val dt = (System.nanoTime() - t1) / 1e9
      System.err.println(
        f"[curve] nlist=$nlm iters=$iters nProbe=$np (${num}/32): " +
          f"recall@10=${hits / denom}%.4f time=$dt%.2fs (brute $bruteS%.2fs)")
    }
    spark.stop()
  }
}
