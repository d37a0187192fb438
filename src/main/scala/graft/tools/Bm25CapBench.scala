package graft.tools

import graft.Tables.table
import graft.operators.Retrieval
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement for the BM25 df-cap (X19c): times the
  * q_bm25_join shape uncapped vs capped (maxDfFraction = 0.7) at a
  * given SF dir. The fixture's ~31-word vocabulary is the measured
  * dense-match worst case — every query matches nearly every document
  * through the 30 dense terms — so the cap's effect here bounds its
  * effect on any real corpus (where the dense fraction is far
  * smaller). Emits one JSON line; results recorded in BASELINE.md.
  */
object Bm25CapBench {
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

    def shape(cap: Double) = {
      val docs = table(spark, sfDir, "documents")
      // q_bm25_join's %97 benchmark slice, plus a slice of docs
      // containing the rare term — at some SFs no %97 doc carries it,
      // and an all-capped query set would make the capped arm's cost
      // trivially zero instead of measuring real sub-cap scoring
      val bench = docs.where(col("doc_id") % 97 === 0 ||
          (array_contains(split(col("text"), " "), "dup") &&
            col("doc_id") % 13 === 0))
        .select(col("doc_id").as("bench_id"), col("text"))
      Retrieval.bm25JoinTopK(
        corpus = docs, corpusId = "doc_id", corpusText = col("text"),
        queries = bench, queryId = "bench_id", queryText = col("text"),
        k = 5, maxDfFraction = cap)
    }

    def time(cap: Double): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = shape(cap).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // warmup both plan shapes, then min-of-2 each (the Bench protocol)
    time(1.0); time(0.7)
    val un = Seq(time(1.0), time(1.0))
    val cp = Seq(time(0.7), time(0.7))
    val line =
      s"""{"metric":"bm25_dfcap","sf":"$sfDir",""" +
        s""""uncapped_sec":${un.map(_._1).min},"uncapped_rows":${un.head._2},""" +
        s""""capped_sec":${cp.map(_._1).min},"capped_rows":${cp.head._2},""" +
        s""""cap":0.7}"""
    println(line)
    System.err.println(line)
    spark.stop()
  }
}
