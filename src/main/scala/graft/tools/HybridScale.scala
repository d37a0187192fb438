package graft.tools

import graft.{ScaleBench, Tables}
import graft.operators.{Retrieval, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** X19f at scale: the per-query hybrid read over BOTH persisted
  * indexes (`bm25JoinTopKIndexed` ⊕ `ivfTopKIndexed`, fused by
  * `rrfFusePerQuery`) measured beside the DIRECT-arm fusion
  * (`bm25JoinTopK` ⊕ `ivfTopKServing`, same parameters) at a scaled
  * corpus. Both arms are semantics-preserving pairs (pinned exact
  * cap; same deterministic codebook at equal iters), so the fused
  * outputs must be row-identical — hard-asserted — and the indexed
  * arm must win the clock at factor >= 30 (retry min-of-2 on
  * inversion, the round-16 discipline): it amortizes the corpus
  * re-explode AND the training/assignment scans across retrievals.
  *
  * Output: one JSON line, also written to SPARK_GRAFT_SCALE_OUT
  * (default SCALE_OUT_HYBRID.json).
  *
  * Usage: runMain graft.tools.HybridScale [baseDir] [factor]
  */
object HybridScale {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse(
      "SPARK_GRAFT_SCALE_OUT", "SCALE_OUT_HYBRID.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir =
      if (factor <= 1) baseDir
      else ScaleBench.scaledDir(spark, baseDir, factor)

    def docs = Tables.table(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
    def emb = Tables.table(spark, dir, "embeddings")
    val embN = emb.count()
    // the query slice: ids present in BOTH tables (the fixture's
    // shared id universe), %97 like the registered query
    val bench = docs.where(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("bench_id"), col("text"))
    def qVecs = emb.filter(col("vec_id") % 97 === 0)

    // persisted indexes, built once per corpus version OUTSIDE the
    // timed thunks (the mtime/_SUCCESS cache convention)
    def bm25Idx: String = {
      val mt = Files.getLastModifiedTime(
        Paths.get(s"$dir/documents.parquet")).toMillis
      val out = s"${System.getProperty("java.io.tmpdir")}/graft-bm25idx-" +
        s"${Paths.get(dir).getFileName.toString}-$mt"
      if (!Files.exists(Paths.get(s"$out/stats/_SUCCESS"))) {
        val t0 = System.nanoTime()
        Retrieval.buildPostingsIndex(
          Tables.table(spark, dir, "documents"), "doc_id", col("text"), out)
        System.err.println(f"[hybrid] bm25 index build: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      out
    }
    def ivfIdx: String = {
      val mt = Files.getLastModifiedTime(
        Paths.get(s"$dir/embeddings.parquet")).toMillis
      val out = s"${System.getProperty("java.io.tmpdir")}/graft-ivfidx-" +
        s"${Paths.get(dir).getFileName.toString}-$mt"
      if (!Files.exists(Paths.get(s"$out/stats/_SUCCESS"))) {
        val t0 = System.nanoTime()
        Similarity.buildIvfIndex(emb, "vec_id", "embedding", out,
          iters = 2, nHint = embN)
        System.err.println(f"[hybrid] ivf index build: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      out
    }
    val (bIdx, vIdx) = (bm25Idx, ivfIdx)

    def fuse(lex: DataFrame, sem: DataFrame): DataFrame =
      Retrieval.rrfFusePerQuery(Seq(
        lex.select(col("bench_id").as("query_id"),
          col("doc_id").as("id"), col("score")),
        sem.select(col("query_id"), col("neighbor_id").as("id"),
          col("cosine").as("score"))),
        "query_id", "id", "score", k = 10)
    def indexedArm(): DataFrame = fuse(
      Retrieval.bm25JoinTopKIndexed(spark, bIdx, "doc_id", bench,
        "bench_id", col("text"), k = 50, maxDfFraction = 1.0),
      Similarity.ivfTopKIndexed(spark, vIdx, qVecs,
        "vec_id", "embedding", k = 50, targetRecall = 0.9))
    def directArm(): DataFrame = fuse(
      Retrieval.bm25JoinTopK(docs, "doc_id", col("text"), bench,
        "bench_id", col("text"), k = 50, maxDfFraction = 1.0),
      Similarity.ivfTopKServing(emb, qVecs, "vec_id", "embedding",
        k = 50, iters = 2, nHint = embN, targetRecall = 0.9))

    def time(body: => Long): Double = {
      System.gc()
      val t0 = System.nanoTime()
      body
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup then timed
    indexedArm().count()
    var idxS = time(indexedArm().count())
    var dirS = time(directArm().count())
    // the two fusions must be ROW-IDENTICAL: both producer pairs are
    // semantics-preserving (exact cap; same deterministic codebook)
    val a = indexedArm().collect().map(_.toString).sorted.toSeq
    val b = directArm().collect().map(_.toString).sorted.toSeq
    if (a != b) throw new AssertionError(
      s"hybrid fusion diverged: indexed ${a.size} rows vs direct " +
        s"${b.size}; first diff: ${a.diff(b).headOption}")
    System.err.println(
      f"[hybrid] ${factor}x indexed $idxS%.2fs vs direct $dirS%.2fs " +
        f"(${a.size} fused rows, row-identical)")
    if (factor >= 30 && idxS >= dirS) {
      System.err.println("[hybrid] inverted — re-timing min-of-2")
      idxS = math.min(time(indexedArm().count()),
        time(indexedArm().count()))
      dirS = math.min(time(directArm().count()),
        time(directArm().count()))
      System.err.println(
        f"[hybrid] retry indexed $idxS%.2fs vs direct $dirS%.2fs")
      if (idxS >= dirS) throw new AssertionError(
        f"indexed hybrid must beat the direct-arm fusion at " +
          f"${factor}x (reproduced): $idxS%.2fs >= $dirS%.2fs")
    }
    val line = s"""{"metric":"hybrid_indexed","factor":$factor,""" +
      s""""n_queries":${bench.count()},"fused_rows":${a.size},""" +
      s""""indexed_s":$idxS,"direct_s":$dirS,"row_identical":true}"""
    println(line)
    System.err.println(line)
    Files.writeString(Paths.get(outPath), line + "\n")
    spark.stop()
  }
}
