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
    *
    * Delivery contract (at-least-once, duplicates bounded to ONE
    * batch): `outDir` commits BEFORE `storeDir`. If the job dies
    * between the two writes, the replayed batch anti-joins against a
    * store missing its own fingerprints and re-emits those rows — a
    * duplicate window of at most one micro-batch, downstream's job to
    * absorb (idempotent keys). The order is deliberate: reversing it
    * (store first) turns the same crash into silent DATA LOSS — the
    * replay would see its fingerprints already present and emit
    * nothing for rows that never reached `outDir`. Exactly-once here
    * would need a transactional sink (e.g. a Delta MERGE) spanning
    * both writes.
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
    if (pathExists(spark, storeDir))
      spark.read.parquet(storeDir)
    else emptyDf(spark, "fp string")

  /** Existence probe through the Hadoop `FileSystem` resolved from the
    * path's own scheme + the session conf — NOT `java.io.File`, which
    * only understands bare local paths: on `hdfs://`, `s3a://` or even
    * a `file:` URI it answers "absent", silently disabling cross-batch
    * dedup in exactly the distributed deployments the store targets.
    */
  private def pathExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  // ---------------------------------------------------------------
  // Tier 3: streaming NEAR-dup dedup via a SimHash signature store.
  // ---------------------------------------------------------------

  /** One micro-batch of near-dup dedup: compute 64-bit SimHash
    * signatures for the batch, band-join (8×8 Hamming LSH — the same
    * banding as Dedup.simhashNearDup) against the signature store,
    * verify candidates with codegen `bit_count(xor)`, and drop batch
    * docs within `maxHamming` of ANY stored doc. Batch-internal
    * near-dups collapse through the batch form of simhashNearDup
    * (min-id winner). Returns the surviving (id, s1, s2, band sigs)
    * rows — content dedup state is ~48 bytes/doc, so a 10B-doc corpus
    * is a ~500 GB store, band-partitionable on disk so each batch
    * probes only matching band files.
    */
  def nearDupBatch(
      batch: DataFrame, store: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    import graft.operators.Dedup
    val sig = Dedup.simhash(batch, idCol, col(textCol))
      .withColumn("s1", conv(substring(col("simhash"), 1, 32), 2, 10).cast("long"))
      .withColumn("s2", conv(substring(col("simhash"), 33, 32), 2, 10).cast("long"))
    val bandArr = array((0 until 8).map(b =>
      substring(col("simhash"), b * 8 + 1, 8)): _*)
    val bands = sig.select(col(idCol), col("s1"), col("s2"),
      posexplode(bandArr).as(Seq("band", "bsig")))
    val ham = bit_count(col("s1").bitwiseXOR(col("st_s1"))) +
      bit_count(col("s2").bitwiseXOR(col("st_s2")))
    val hitIds = bands
      .join(store.select(col("band").as("st_band"), col("bsig").as("st_bsig"),
        col("s1").as("st_s1"), col("s2").as("st_s2")),
        col("band") === col("st_band") && col("bsig") === col("st_bsig"))
      .filter(ham <= maxHamming)
      .select(col(idCol)).distinct()
    // drop store-near rows, then collapse batch-internal near-dups:
    // losers of a within-batch near-dup pair (id_a < id_b ⇒ b loses)
    val fresh = sig.join(hitIds, Seq(idCol), "left_anti")
    val innerPairs = Dedup.simhashNearDup(
      batch.join(fresh.select(col(idCol)), Seq(idCol), "left_semi"),
      idCol, col(textCol), maxHamming)
    fresh.join(innerPairs.select(col("id_b").as(idCol)).distinct(),
        Seq(idCol), "left_anti")
      .select(col(idCol), col("s1"), col("s2"),
        posexplode(bandArr).as(Seq("band", "bsig")))
  }

  /** Tier 3 sink: near-dup-deduplicated ids append to `outDir`; the
    * survivors' banded signatures append to the signature store.
    */
  def nearDupAgainstStore(
      docs: DataFrame, idCol: String, textCol: String, maxHamming: Int,
      storeDir: String, outDir: String, checkpoint: String): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val store =
          if (pathExists(spark, storeDir)) spark.read.parquet(storeDir)
          else emptyDf(spark, "bsig string, s1 bigint, s2 bigint, band int")
        val fresh = nearDupBatch(batch, store, idCol, textCol, maxHamming).persist()
        try {
          // out before store: same at-least-once duplicate-window
          // contract as dedupAgainstStore (see its scaladoc)
          fresh.select(idCol).distinct().write.mode(SaveMode.Append).parquet(outDir)
          // band-partitioned layout: the probe join keys on (band,
          // bsig), so directory-partitioning the store by band lets
          // any banded read plan prune to matching band files and
          // keeps per-band files compactable independently
          fresh.select("bsig", "s1", "s2", "band").write
            .partitionBy("band")
            .mode(SaveMode.Append).parquet(storeDir)
        } finally fresh.unpersist(blocking = false)
      }

  private def emptyDf(spark: SparkSession, ddl: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      org.apache.spark.sql.types.StructType.fromDDL(ddl))
}
