package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The indexed-retrieval payoff of cluster structure (r15 finding #4,
  * second half): on the planted-cluster corpus whose recall curve
  * [[RecallCurve]]'s clustered mode measured (recall@10 = 1.0 down to
  * a 1/32 probe), run `ivfTopKIndexed` at the NARROW probe the
  * measured curve licenses — `servingConfigFor(nlist, 0.9,
  * clustered = true)` = nlist/8 — beside the weak-structure wide
  * default (nlist/2), same persisted index, and assert:
  *  - both arms' recall@10 >= 0.9 (fixed-probe recalls vs exact brute);
  *  - the narrow arm beats the wide arm's wall (retry min-of-2 on
  *    inversion — the round-16 discipline): partition pruning to 1/8
  *    of the cells is REAL saved IO + compute, the index's whole
  *    point once structure lets the probe narrow.
  *
  * Output: one JSON line, also written to SPARK_GRAFT_SCALE_OUT
  * (default SCALE_OUT_CLUSTEREDIVF.json).
  *
  * Usage: runMain graft.tools.ClusteredIvf [nRows] [nClusters] [sigma]
  */
object ClusteredIvf {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(60000L)
    val ncl = args.lift(1).map(_.toInt).getOrElse(256)
    val sigma = args.lift(2).map(_.toDouble).getOrElse(0.15)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse(
      "SPARK_GRAFT_SCALE_OUT", "SCALE_OUT_CLUSTEREDIVF.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // materialize the corpus to parquet so every arm reads the same
    // on-disk table (the index build would otherwise re-generate)
    val corpusDir = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft-clustered-$nRows-$ncl"
    if (!Files.exists(Paths.get(s"$corpusDir/_SUCCESS")))
      RecallCurve.plantedClusters(spark, nRows, ncl, sigma)
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(corpusDir)
    val emb = spark.read.parquet(corpusDir)
    val q = emb.filter(col("vec_id") % 20 === 0)
    val (nl, _) = Similarity.ivfConfigFor(nRows)
    val npNarrow = Similarity.servingConfigFor(nl, 0.9, clustered = true)
    val npWide = Similarity.servingConfigFor(nl, 0.9)
    val idx = s"$corpusDir-ivfidx"
    if (!Files.exists(Paths.get(s"$idx/stats/_SUCCESS"))) {
      val t0 = System.nanoTime()
      Similarity.buildIvfIndex(emb, "vec_id", "embedding", idx,
        nlist = nl, iters = 2, nHint = nRows)
      System.err.println(f"[clustered] index build: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    def time(body: => Long): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    def indexed(np: Int) = Similarity.ivfTopKIndexed(
      spark, idx, q, "vec_id", "embedding", k = 10, nProbe = np)
    // warmup (codegen/JIT), then one timed pass per arm
    indexed(npNarrow).count()
    var narrowS = time(indexed(npNarrow).count())
    var wideS = time(indexed(npWide).count())
    val bruteS = time(Similarity.bruteForceTopK(
      emb, q, "vec_id", "embedding", k = 10).count())
    val brute = Similarity.bruteForceTopK(
      emb, q, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").cache()
    val denom = brute.count().toDouble
    def recall(np: Int): Double =
      math.round(indexed(np).select("query_id", "neighbor_id")
        .intersect(brute).count() / denom * 10000) / 10000.0
    val rNarrow = recall(npNarrow)
    val rWide = recall(npWide)
    System.err.println(
      f"[clustered] nlist=$nl narrow np=$npNarrow: $narrowS%.2fs " +
        f"recall $rNarrow%.4f; wide np=$npWide: $wideS%.2fs recall " +
        f"$rWide%.4f; brute $bruteS%.2fs")
    for ((arm, r) <- Seq("narrow" -> rNarrow, "wide" -> rWide))
      if (r < 0.9) throw new AssertionError(
        f"$arm-probe recall@10 below the floor on the clustered " +
          f"corpus: $r%.4f < 0.90")
    if (narrowS >= wideS) {
      System.err.println(
        "[clustered] narrow>=wide — re-timing both arms min-of-2")
      narrowS = math.min(time(indexed(npNarrow).count()),
        time(indexed(npNarrow).count()))
      wideS = math.min(time(indexed(npWide).count()),
        time(indexed(npWide).count()))
      System.err.println(
        f"[clustered] retry narrow $narrowS%.2fs wide $wideS%.2fs")
      if (narrowS >= wideS) throw new AssertionError(
        f"narrow probe must beat the wide default on the clustered " +
          f"corpus (reproduced): $narrowS%.2fs >= $wideS%.2fs")
    }
    val line = s"""{"metric":"clustered_ivf","n_corpus":$nRows,""" +
      s""""n_clusters":$ncl,"sigma":$sigma,"nlist":$nl,""" +
      s""""np_narrow":$npNarrow,"np_wide":$npWide,""" +
      s""""narrow_s":$narrowS,"wide_s":$wideS,"brute_s":$bruteS,""" +
      s""""narrow_recall":$rNarrow,"wide_recall":$rWide}"""
    println(line)
    System.err.println(line)
    Files.writeString(Paths.get(outPath), line + "\n")
    spark.stop()
  }
}
