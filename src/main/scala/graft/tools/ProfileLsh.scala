package graft.tools

import graft.operators.Dedup
import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage wall breakdown of the MinHash-LSH near-dup
  * pipeline on a given corpus dir — the plan-audit companion to
  * ScaleBench's end-to-end `ngram_lsh` number: which stage owns the
  * wall at scale (shingle explode, signature agg, band self-join, or
  * candidate verify)?
  *
  * Usage: runMain graft.tools.ProfileLsh <dir> [k bands rowsPerBand minJ]
  */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(2)
    val bands = args.lift(2).map(_.toInt).getOrElse(8)
    val rpb = args.lift(3).map(_.toInt).getOrElse(2)
    val minJ = args.lift(4).map(_.toDouble).getOrElse(0.5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs -> $r")
      r
    }
    val docs = Tables.table(spark, dir, "documents")
    val sh = Dedup.explodedShingles(docs, "doc_id", col("text"), k).cache()
    t("shingle explode+cache")(sh.count())
    val bandsDf = Dedup.minhashBandsFromShingles(sh, "doc_id", bands, rpb).cache()
    t("signature agg+cache")(bandsDf.count())
    val cand = bandsDf.as("a")
      .join(bandsDf.as("b"), Seq("band", "sig"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
      .cache()
    t("band self-join candidates")(cand.count())
    val candIds = cand.select(col("id_a").as("doc_id"))
      .union(cand.select(col("id_b").as("doc_id"))).distinct()
    val gsets = sh.join(broadcast(candIds), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), xxhash64(col("shingle")).as("__gh"))
      .groupBy(col("doc_id")).agg(collect_list(col("__gh")).as("__gs"))
      .cache()
    t("gram-set arrays (cand docs only)")(gsets.count())
    val out = cand
      .join(gsets.select(col("doc_id").as("id_a"), col("__gs").as("__ga")), "id_a")
      .join(gsets.select(col("doc_id").as("id_b"), col("__gs").as("__gb")), "id_b")
      .withColumn("n_a", size(col("__ga")).cast("long"))
      .withColumn("n_b", size(col("__gb")).cast("long"))
      .filter(least(col("n_a"), col("n_b")).cast("double") >=
        lit(minJ) * greatest(col("n_a"), col("n_b")).cast("double"))
      .withColumn("inter",
        size(array_intersect(col("__ga"), col("__gb"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJ)
    t("array-verify joins + jaccard")(out.count())
    t("end-to-end fresh (operator)")(Dedup.minhashNearDup(
      docs, "doc_id", col("text"), k, bands, rpb, minJ).count())
    spark.stop()
  }
}
