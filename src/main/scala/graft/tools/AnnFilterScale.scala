package graft.tools

import graft.{ScaleBench, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** X3h crossover measurement (r18 verdict task #4): metadata-filtered
  * ANN — exact brute force over the FILTERED corpus vs the filtered
  * read of the persisted IVF index, across predicate selectivities and
  * corpus factors, fixed |Q| (the AnnScale convention: query growth
  * must not contaminate corpus-growth walls).
  *
  * The point being measured: the same selectivity that makes the
  * indexed arm's recall fragile (few matching vectors per probed
  * cell) makes the brute arm cheap (the pair join is |Q| × survivors).
  * The artifact pins WHERE the walls cross, and
  * [[Similarity.annFilteredTopK]]'s default bruteBudget must sit
  * inside the measured brute-win region at every factor
  * (hard-asserted below).
  *
  * Output: one JSON line, also written to SPARK_GRAFT_SCALE_OUT
  * (default SCALE_OUT_ANNFILTER.json).
  *
  * Usage: runMain graft.tools.AnnFilterScale [baseDir] [f1,f2,...]
  */
object AnnFilterScale {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(1, 30))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse(
      "SPARK_GRAFT_SCALE_OUT", "SCALE_OUT_ANNFILTER.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val baseEmb = Tables.table(spark, baseDir, "embeddings")
    val baseMax = baseEmb.agg(max(col("vec_id"))).head.getLong(0)
    def queries(dir: String): DataFrame =
      Tables.table(spark, dir, "embeddings")
        .filter(col("vec_id") % 20 === 0 && col("vec_id") <= baseMax)
        .select("vec_id", "embedding")

    // labels are 0..9 ≈ uniform: three selectivity regimes
    val preds: Seq[(String, Column)] = Seq(
      "sel10" -> (col("label") === 3),
      "sel40" -> (col("label") % 3 === 0),
      "sel100" -> (col("label") >= 0))

    def indexDir(dir: String, n: Long): String = {
      val srcMtime = Files.getLastModifiedTime(
        Paths.get(s"$dir/embeddings.parquet")).toMillis
      val out = s"${System.getProperty("java.io.tmpdir")}/graft-ivffidx-" +
        s"${Paths.get(dir).getFileName.toString}-$srcMtime"
      if (!Files.exists(Paths.get(s"$out/stats/_SUCCESS"))) {
        val t0 = System.nanoTime()
        Similarity.buildIvfIndex(Tables.table(spark, dir, "embeddings"),
          "vec_id", "embedding", out, iters = 2, nHint = n,
          attrs = Seq("label"))
        System.err.println(f"[annfilter] $dir index build: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      out
    }

    def time(body: => Long): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    def minOf2(body: => Long): Double = math.min(time(body), time(body))

    val budget = 4_000_000L // Similarity.annFilteredTopK default (dots)
    val results = factors.map { factor =>
      val dir =
        if (factor <= 1) baseDir
        else ScaleBench.scaledDir(spark, baseDir, factor)
      val n = Tables.table(spark, dir, "embeddings").count()
      val idx = indexDir(dir, n)
      val q = queries(dir)
      val cells = spark.read.parquet(s"$idx/cells")
      // warmup both plan shapes once per factor list head
      if (factor == factors.head) {
        Similarity.bruteForceTopK(cells.where(preds.head._2)
          .select(col("neighbor_id").as("vec_id"), col("cv").as("embedding")),
          q, "vec_id", "embedding", k = 10).count()
        Similarity.ivfTopKFilteredIndexed(spark, idx, q,
          "vec_id", "embedding", k = 10, pred = preds.head._2).count()
      }
      val rows = preds.map { case (name, pred) =>
        val survivors = cells.where(pred).count()
        val bruteW = minOf2(Similarity.bruteForceTopK(
          cells.where(pred)
            .select(col("neighbor_id").as("vec_id"), col("cv").as("embedding")),
          q, "vec_id", "embedding", k = 10).count())
        val ivfW = minOf2(Similarity.ivfTopKFilteredIndexed(
          spark, idx, q, "vec_id", "embedding", k = 10, pred = pred).count())
        System.err.println(f"[annfilter] ${factor}x $name " +
          f"survivors=$survivors brute $bruteW%.2fs indexed $ivfW%.2fs")
        (name, survivors, bruteW, ivfW)
      }
      // the default budget must sit inside the measured brute-win
      // region: every predicate with survivors × |Q| ≤ budget must
      // have brute ≤ indexed wall (1.25 noise margin)
      val nQ = q.count()
      rows.filter(_._2 * nQ <= budget).foreach { case (name, s, b, i) =>
        if (b > i * 1.25) throw new AssertionError(
          f"bruteDotBudget=$budget is outside the brute-win region: " +
            f"$name at ${factor}x has $s survivors × $nQ queries, " +
            f"brute $b%.2fs > indexed $i%.2fs × 1.25")
      }
      (factor, n, rows)
    }
    val blocks = results.map { case (factor, n, rows) =>
      val inner = rows.map { case (name, s, b, i) =>
        s""""$name":{"survivors":$s,"brute_s":$b,"indexed_s":$i}"""
      }.mkString(",")
      s""""f$factor":{"n_corpus":$n,$inner}"""
    }
    val nQBase = queries(baseDir).count()
    val line = s"""{"metric":"ann_filtered_crossover",""" +
      s""""brute_dot_budget":$budget,"n_queries":$nQBase,""" +
      s"""${blocks.mkString(",")}}"""
    println(line)
    System.err.println(line)
    Files.writeString(Paths.get(outPath), line + "\n")
    spark.stop()
  }
}
