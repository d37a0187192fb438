package graft.tools

import graft.Tables
import graft.operators.Pca
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** VERDICT r19 task #5: decompose `q_pca_project`'s cost — the top
  * bench slot for three rounds (5.1 → 5.7 → 6.4 s) — into its
  * stages on one clean window: dim probe (the `size()` head), the
  * moment pass + driver Jacobi (fit), the codegen projection scan,
  * and the registered composite. Prints one line per stage
  * (min-of-2 after a warm pass, the Bench protocol).
  */
object PcaDecompose {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def e = Tables.table(spark, sfDir, "embeddings")
    def time(label: String)(f: => Unit): Double = {
      f // warm
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$label%-28s $best%.3f s")
      best
    }
    time("scan+count")(e.count())
    time("dim-probe (size head)")(e.select(size(col("embedding"))).head)
    time("fit (moments+jacobi)")(Pca.fit(e, "embedding", k = 4))
    val model = Pca.fit(e, "embedding", k = 4)
    time("project (prefit model)") {
      Pca.project(e, "embedding", model, whiten = true)
        .select(col("vec_id") +: (0 until 4).map(i =>
          round(col("pca").getItem(i), 6).as(s"pca_$i")): _*)
        .orderBy(col("vec_id")).count()
    }
    time("registered composite") {
      val m = Pca.fit(e, "embedding", k = 4)
      Pca.project(e, "embedding", m, whiten = true)
        .select(col("vec_id") +: (0 until 4).map(i =>
          round(col("pca").getItem(i), 6).as(s"pca_$i")): _*)
        .orderBy(col("vec_id")).count()
    }
    spark.stop()
  }
}
