package graft.tools

import graft.Tables
import graft.operators.{AnnTier, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** X3g measurement: the retrieval-tier CROSSOVER at 30×, and the
  * contract that [[Similarity.annTierFor]]'s pick is the right call
  * at every measured |Q| — the rule exists to encode this sweep, so
  * the sweep asserts the rule.
  *
  * Fixed 60k corpus (the r16 artifact scale), |Q| swept across the
  * crossover: 100 (the measured brute regime), 250 / 1000 (the
  * bracket), 2000 (the indexed regime). Contracts (hard-asserted,
  * min-of-2 retry on violation — the round-16 discipline):
  *  - at |Q| = 100 the chooser says Brute and brute IS faster;
  *  - at |Q| = 2000 the chooser says Indexed and indexed IS faster;
  *  - at every swept |Q| the chosen tier's wall is within 1.35× of
  *    the fastest arm (the crossover region is allowed to tie — the
  *    rule's job is to never pick a LANDSLIDE loser).
  *
  * Output: one JSON line with walls, picks and the empirical
  * crossover bracket, written to SPARK_GRAFT_SCALE_OUT (default
  * SCALE_OUT_TIER.json).
  *
  * Usage: runMain graft.tools.TierScale [baseDir] [factor]
  */
object TierScale {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse(
      "SPARK_GRAFT_SCALE_OUT", "SCALE_OUT_TIER.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir =
      if (factor <= 1) baseDir
      else graft.ScaleBench.scaledDir(spark, baseDir, factor)
    val emb = Tables.table(spark, dir, "embeddings")
    val n = emb.count()
    // fixed query batches drawn from the base-replica ids (identical
    // rows at any factor — the AnnScale convention)
    val baseMax = Tables.table(spark, baseDir, "embeddings")
      .agg(max(col("vec_id"))).head.getLong(0)
    def queries(mod: Int): DataFrame =
      emb.filter(col("vec_id") % mod === 0 && col("vec_id") <= baseMax)
    val sweep = Seq(20 -> 100L, 8 -> 250L, 2 -> 1000L, 1 -> 2000L)

    // persisted index: the AnnScale cache (build outside any timing)
    val srcMtime = Files.getLastModifiedTime(
      Paths.get(s"$dir/embeddings.parquet")).toMillis
    val idx = s"${System.getProperty("java.io.tmpdir")}/graft-ivfidx-" +
      s"${Paths.get(dir).getFileName.toString}-$srcMtime"
    if (!Files.exists(Paths.get(s"$idx/stats/_SUCCESS")))
      Similarity.buildIvfIndex(emb, "vec_id", "embedding", idx,
        iters = 2, nHint = n)

    def armRun(name: String, q: DataFrame): () => Long = name match {
      case "brute" => () =>
        Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", k = 10)
          .count()
      case "indexed" => () =>
        Similarity.ivfTopKIndexed(spark, idx, q, "vec_id", "embedding",
          k = 10, targetRecall = 0.9).count()
    }
    def time(body: => Long): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    def minOf2(r: () => Long): Double = math.min(time(r()), time(r()))

    // warmup both plan shapes on the smallest batch
    armRun("brute", queries(20))(); armRun("indexed", queries(20))()

    val rows = sweep.map { case (mod, expQ) =>
      val q = queries(mod)
      val nq = q.count()
      require(nq == expQ, s"query slice %$mod: $nq != $expQ")
      val walls = scala.collection.mutable.Map(
        "brute" -> time(armRun("brute", q)()),
        "indexed" -> time(armRun("indexed", q)()))
      val pick = Similarity.annTierFor(n, nq, hasIndex = true,
        targetRecall = 0.9, clustered = false) match {
        case AnnTier.Brute => "brute"
        case _: AnnTier.Indexed => "indexed"
        case _: AnnTier.Serving => "serving"
      }
      walls.foreach { case (a, w) =>
        System.err.println(f"[tier] |Q|=$nq $a: $w%.2fs")
      }
      System.err.println(s"[tier] |Q|=$nq chooser pick: $pick")
      // the chosen tier must be within 1.35x of the fastest arm;
      // min-of-2 retry of BOTH arms on violation, reproduce throws
      def check(): Boolean =
        walls(pick) <= 1.35 * walls.values.min
      if (factor >= 30 && !check()) {
        System.err.println(s"[tier] |Q|=$nq pick above margin — " +
          "retrying both arms min-of-2")
        walls("brute") = minOf2(armRun("brute", q))
        walls("indexed") = minOf2(armRun("indexed", q))
        if (!check()) throw new AssertionError(
          f"tier chooser picked a landslide loser at |Q|=$nq " +
            f"(reproduced): $pick ${walls(pick)}%.2fs vs best " +
            f"${walls.values.min}%.2fs")
      }
      (nq, walls, pick)
    }
    // regime anchors: the extremes must be strict wins for the pick
    def anchor(nq: Long, expectPick: String): Unit = {
      val (_, walls, pick) = rows.find(_._1 == nq).get
      if (pick != expectPick) throw new AssertionError(
        s"chooser must pick $expectPick at |Q|=$nq, got $pick")
      val other = walls.keys.find(_ != expectPick).get
      if (factor >= 30 && walls(expectPick) >= walls(other)) {
        val w1 = minOf2(armRun(expectPick, queries(
          sweep.find(_._2 == nq).get._1)))
        val w2 = minOf2(armRun(other, queries(
          sweep.find(_._2 == nq).get._1)))
        System.err.println(
          f"[tier] anchor |Q|=$nq retry: $expectPick $w1%.2fs $other $w2%.2fs")
        if (w1 >= w2) throw new AssertionError(
          f"$expectPick must win at |Q|=$nq (reproduced): " +
            f"$w1%.2fs >= $w2%.2fs")
      }
    }
    anchor(100L, "brute")
    anchor(2000L, "indexed")

    val blocks = rows.map { case (nq, walls, pick) =>
      val w = walls.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${k}_s":$v""" }.mkString(",")
      s""""q$nq":{$w,"pick":"$pick"}"""
    }
    val line = s"""{"metric":"tier_crossover","factor":$factor,""" +
      s""""n_corpus":$n,${blocks.mkString(",")}}"""
    println(line)
    System.err.println(line)
    Files.writeString(Paths.get(outPath), line + "\n")
    spark.stop()
  }
}
