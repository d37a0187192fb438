package graft.streaming

import graft.functions.TextFns
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

/** Streaming face of X1/X2 (SURVEY.md §2.10): deduplicate a document
  * stream against EVERYTHING already ingested, not just the current
  * micro-batch — the shape every continuous training-data pipeline
  * needs (a crawler emits documents forever; the corpus must stay
  * deduplicated without re-scanning itself).
  *
  * Two tiers:
  *
  * 1. [[dedupWithinStream]] — bounded exact dedup inside the stream
  *    via `dropDuplicatesWithinWatermark` on the content fingerprint:
  *    state is bounded by the watermark (Spark evicts fingerprints
  *    older than the delay), the right tool when duplicates arrive
  *    close together (retries, double-sends).
  *
  * 2. [[dedupAgainstStore]] — `foreachBatch` anti-join against a
  *    persistent parquet fingerprint store, for duplicates arriving
  *    ARBITRARILY far apart. Per batch: new docs are anti-joined
  *    against the store on the md5 content fingerprint (X4's
  *    fingerprint — order/multiplicity-insensitive token bag), batch-
  *    internal dups collapse to a deterministic winner, survivors'
  *    fingerprints append to the store. The store is fingerprints
  *    ONLY (16-byte hex per document, not content) — at 10B documents
  *    that is ~500 GB of parquet, scan-pruned by the anti-join's
  *    broadcast/DPP at batch sizes ≪ store size; compact/bucket it by
  *    fingerprint prefix when batches grow. At-least-once safe: a
  *    replayed batch anti-joins against fingerprints it already wrote
  *    and emits nothing.
  */
object StreamingDedup {

  /** Tier 1: exact in-stream dedup, state bounded by the watermark. */
  def dedupWithinStream(
      docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermarkDelay: String): DataFrame =
    docs
      .withColumn("__fp", TextFns.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** One micro-batch of tier 2: returns the batch rows that are new
    * w.r.t. `store` AND first-within-batch (min `idCol` wins,
    * X1's deterministic-winner rule). Pure batch logic — unit-testable
    * without a stream.
    */
  def dedupBatch(batch: DataFrame, store: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = batch.withColumn("__fp", TextFns.fingerprint(col(textCol)))
    val newDocs = fp.join(store, fp("__fp") === store("fp"), "left_anti")
    graft.operators.Dedup.exact(newDocs, Seq("__fp"), col(idCol))
  }

  /** Tier 2: the full streaming sink. Deduplicated rows append to
    * `outDir`; their fingerprints append to `storeDir`. The store read
    * happens INSIDE foreachBatch so each batch sees all fingerprints
    * committed by earlier batches.
    */
  def dedupAgainstStore(
      docs: DataFrame, idCol: String, textCol: String,
      storeDir: String, outDir: String, checkpoint: String): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val store = existingStore(spark, storeDir)
        val fresh = dedupBatch(batch, store, idCol, textCol)
          .persist() // two actions below; tiny (one batch's survivors)
        try {
          fresh.drop("__fp").write.mode(SaveMode.Append).parquet(outDir)
          fresh.select(col("__fp").as("fp")).write.mode(SaveMode.Append).parquet(storeDir)
        } finally fresh.unpersist(blocking = false)
      }

  /** The fingerprint store, empty-safe before first append. */
  def existingStore(spark: SparkSession, storeDir: String): DataFrame =
    if (new java.io.File(storeDir).exists())
      spark.read.parquet(storeDir)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("fp",
            org.apache.spark.sql.types.StringType))))
}
