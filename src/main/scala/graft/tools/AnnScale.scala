package graft.tools

import graft.{ScaleBench, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Fixed-query-batch ANN scale measurement (r15 finding #2): the
  * per-round ScaleBench ann slice is PROPORTIONAL (5% of vectors), so
  * its 100× walls conflate query-set growth with corpus growth. This
  * tool holds |Q| FIXED at the BASE corpus's slice (the bm25/decontam
  * convention) and measures brute / serving / indexed / PQ walls at
  * each factor — the number that isolates corpus growth.
  *
  * Contracts (hard-asserted, wall comparisons retry min-of-2 on
  * inversion — the round-16 ScaleBench discipline):
  *  - serving/indexed/PQ recall@10 >= the 0.9 retrieval floor at
  *    every factor (fixed query set, measured vs exact brute force);
  *  - indexed beats serving on the clock at factor >= 30 (it skips
  *    training + full-corpus assignment);
  *  - fixed-|Q| indexed wall grows at most linearly in the corpus
  *    (ratio bound with a 1.25 noise margin between factors).
  *
  * Output: one JSON line, also written to the path in
  * SPARK_GRAFT_SCALE_OUT (default SCALE_OUT_ANNFIXED.json).
  *
  * Usage: runMain graft.tools.AnnScale [baseDir] [factor1,factor2,...]
  */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(30, 100))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val target = 0.9
    val candMult = sys.env.getOrElse("SPARK_GRAFT_PQ_CANDMULT", "50").toInt
    val outPath = sys.env.getOrElse(
      "SPARK_GRAFT_SCALE_OUT", "SCALE_OUT_ANNFIXED.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the FIXED query batch: the base corpus's 5% slice — replica-0
    // ids only, identical rows at every factor
    val baseEmb = Tables.table(spark, baseDir, "embeddings")
    val baseMax = baseEmb.agg(max(col("vec_id"))).head.getLong(0)
    def queries(dir: String): DataFrame =
      Tables.table(spark, dir, "embeddings")
        .filter(col("vec_id") % 20 === 0 && col("vec_id") <= baseMax)

    def ivfIndexDir(dir: String, n: Long): String = {
      val srcMtime = Files.getLastModifiedTime(
        Paths.get(s"$dir/embeddings.parquet")).toMillis
      val out = s"${System.getProperty("java.io.tmpdir")}/graft-ivfidx-" +
        s"${Paths.get(dir).getFileName.toString}-$srcMtime"
      if (!Files.exists(Paths.get(s"$out/stats/_SUCCESS"))) {
        val t0 = System.nanoTime()
        Similarity.buildIvfIndex(Tables.table(spark, dir, "embeddings"),
          "vec_id", "embedding", out, iters = 2, nHint = n)
        System.err.println(f"[annfixed] $dir ivf index build: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      out
    }
    def pqIndexDir(dir: String, n: Long): String = {
      val srcMtime = Files.getLastModifiedTime(
        Paths.get(s"$dir/embeddings.parquet")).toMillis
      val out = s"${System.getProperty("java.io.tmpdir")}/graft-ivfpq-" +
        s"${Paths.get(dir).getFileName.toString}-$srcMtime"
      if (!Files.exists(Paths.get(s"$out/stats/_SUCCESS"))) {
        val t0 = System.nanoTime()
        Similarity.buildIvfPqIndex(Tables.table(spark, dir, "embeddings"),
          "vec_id", "embedding", out, iters = 2, m = 8, ks = 256,
          nHint = n)
        System.err.println(f"[annfixed] $dir pq index build: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      out
    }

    case class Arm(name: String, run: () => Long)
    def arms(dir: String, n: Long): Seq[Arm] = {
      val q = queries(dir)
      val emb = Tables.table(spark, dir, "embeddings")
      Seq(
        Arm("brute", () => Similarity.bruteForceTopK(
          emb, q, "vec_id", "embedding", k = 10).count()),
        Arm("serving", () => Similarity.ivfTopKServing(
          emb, q, "vec_id", "embedding", k = 10, nHint = n,
          targetRecall = target).count()),
        Arm("indexed", () => Similarity.ivfTopKIndexed(
          spark, ivfIndexDir(dir, n), q, "vec_id", "embedding",
          k = 10, targetRecall = target).count()),
        Arm("pq", () => Similarity.ivfPqTopK(
          spark, pqIndexDir(dir, n), q, "vec_id", "embedding",
          k = 10, targetRecall = target, candMult = candMult).count()))
    }
    def time(body: => Long): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    def minOf2(a: Arm): Double = math.min(time(a.run()), time(a.run()))

    val results = factors.map { factor =>
      val dir =
        if (factor <= 1) baseDir
        else ScaleBench.scaledDir(spark, baseDir, factor)
      val n = Tables.table(spark, dir, "embeddings").count()
      // indexes built OUTSIDE the timed thunks (the X19e convention)
      ivfIndexDir(dir, n); pqIndexDir(dir, n)
      // warmup: codegen/JIT per plan shape at the base corpus
      if (factor == factors.head) arms(dir, n).foreach(_.run())
      val walls = scala.collection.mutable.Map(
        arms(dir, n).map { a =>
          val s = time(a.run())
          System.err.println(f"[annfixed] ${factor}x ${a.name}: $s%.2fs")
          a.name -> s
        }: _*)
      // recall vs exact brute force, untimed, fixed |Q|
      val q = queries(dir)
      val emb = Tables.table(spark, dir, "embeddings")
      val brute = Similarity.bruteForceTopK(
        emb, q, "vec_id", "embedding", k = 10)
        .select("query_id", "neighbor_id").cache()
      val denom = brute.count().toDouble
      def recall(df: DataFrame): Double =
        math.round(df.select("query_id", "neighbor_id")
          .intersect(brute).count() / denom * 10000) / 10000.0
      val recalls = Map(
        "serving" -> recall(Similarity.ivfTopKServing(
          emb, q, "vec_id", "embedding", k = 10, nHint = n,
          targetRecall = target)),
        "indexed" -> recall(Similarity.ivfTopKIndexed(
          spark, ivfIndexDir(dir, n), q, "vec_id", "embedding",
          k = 10, targetRecall = target)),
        "pq" -> recall(Similarity.ivfPqTopK(
          spark, pqIndexDir(dir, n), q, "vec_id", "embedding",
          k = 10, targetRecall = target, candMult = candMult)))
      brute.unpersist()
      recalls.foreach { case (a, r) =>
        System.err.println(f"[annfixed] ${factor}x $a recall@10 $r%.4f")
        if (factor >= 30 && r < target) throw new AssertionError(
          f"$a recall@10 below the retrieval floor at ${factor}x: " +
            f"$r%.4f < $target%.2f")
      }
      // indexed must beat serving (retry min-of-2 on inversion)
      if (factor >= 30 && walls("indexed") >= walls("serving")) {
        System.err.println(
          s"[annfixed] ${factor}x indexed>=serving — retrying min-of-2")
        val i2 = minOf2(arms(dir, n).find(_.name == "indexed").get)
        val s2 = minOf2(arms(dir, n).find(_.name == "serving").get)
        System.err.println(
          f"[annfixed] ${factor}x retry indexed $i2%.2fs serving $s2%.2fs")
        // the retried walls ARE the measurement — write them back so
        // the growth check and the emitted artifact carry them
        walls("indexed") = i2
        walls("serving") = s2
        if (i2 >= s2) throw new AssertionError(
          f"indexed must beat serving at ${factor}x (reproduced): " +
            f"$i2%.2fs >= $s2%.2fs")
      }
      (factor, n, walls, recalls, dir)
    }
    // fixed-|Q| growth bound between consecutive factors: at most
    // linear in the corpus, 1.25 noise margin; one min-of-2 retry of
    // BOTH endpoints on violation (reproduce-on-retry throws)
    for (Seq((f1, n1, w1, _, d1), (f2, n2, w2, _, d2)) <-
           results.sliding(2) if results.size > 1) {
      val bound = n2.toDouble / n1.toDouble * 1.25
      def ratio = w2("indexed") / w1("indexed")
      System.err.println(
        f"[annfixed] indexed growth ${f1}x→${f2}x: wall ratio " +
          f"$ratio%.2f vs corpus ratio ${n2.toDouble / n1}%.2f")
      if (ratio > bound) {
        System.err.println(
          s"[annfixed] growth bound broken — retrying min-of-2")
        w1("indexed") = minOf2(arms(d1, n1).find(_.name == "indexed").get)
        w2("indexed") = minOf2(arms(d2, n2).find(_.name == "indexed").get)
        System.err.println(
          f"[annfixed] retry indexed ${f1}x ${w1("indexed")}%.2fs " +
            f"${f2}x ${w2("indexed")}%.2fs: ratio $ratio%.2f")
        if (ratio > bound) throw new AssertionError(
          f"fixed-|Q| indexed wall grew superlinearly (reproduced): " +
            f"$ratio%.2f > $bound%.2f (${f1}x→${f2}x)")
      }
    }
    val blocks = results.map { case (factor, n, walls, recalls, _) =>
      val w = walls.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${k}_s":$v""" }
      val r = recalls.map { case (k, v) => s""""${k}_recall":$v""" }
      s""""f$factor":{"n_corpus":$n,${(w ++ r).mkString(",")}}"""
    }
    val nQ = queries(baseDir).count()
    val line = s"""{"metric":"ann_fixed_q","n_queries":$nQ,""" +
      s""""cand_mult":$candMult,${blocks.mkString(",")}}"""
    println(line)
    System.err.println(line)
    Files.writeString(Paths.get(outPath), line + "\n")
    spark.stop()
  }
}
