package graft.streaming

import graft.operators.Curation
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** ST16: streaming maintenance of the X13d Kneser–Ney trigram model —
  * keep the corpus-internal LM fresh as documents stream in, so
  * quality scoring ([[graft.operators.Curation.kneserNeyLogProb]])
  * serves from a store instead of re-counting the corpus per batch.
  *
  * Why this streams CLEANLY: the ENTIRE KN model derives from one
  * trigram count table c(w1,w2,w3) — context totals, every
  * continuation-type count (N1+), and the bigram-type marginals are
  * all reaggregations of it. Trigram counts are SUMMABLE over
  * document batches (documents are append-only), so the store's only
  * state is the merged count table — the [[StreamingMatView]] merge
  * shape, exactly like [[StreamingPostings]]' df state.
  *
  * Layout under `storeDir`:
  *   state-<version>/   (w1, w2, w3, c3) — the summable trigram counts
  *   _CURRENT           "<version> <batchId> <nDocs>"
  *
  * Commit protocol: write `state-<v+1>` FULLY, THEN atomically move
  * the pointer (crash ⇒ old pointer + an orphan the replay
  * overwrites); replays at or below the committed batchId are
  * no-ops. SINGLE WRITER, like every graft streaming store
  * (foreachBatch is naturally serial).
  *
  * Query face [[knScoreFromStore]]: scores any document batch through
  * the IDENTICAL shared stages as the batch operator
  * ([[Curation.knModelLogProbs]] over the store's counts +
  * [[Curation.knScoreDocs]]) — scores are bit-equal to
  * `kneserNeyLogProb` run over everything ingested (spec-pinned,
  * replay and crash included), because the merged count table is
  * exactly the batch aggregation's count table. Out-of-corpus
  * documents score over their in-model trigram positions (n_trigrams
  * reports how many) — the CCNet deployment shape: train the LM on
  * the reference corpus, score the incoming stream.
  */
object StreamingNgramLm {

  private def pointerPath(dir: String) = Paths.get(dir, "_CURRENT")

  /** (version, lastBatchId, nDocs); (0, -1, 0) initially. */
  def readPointer(storeDir: String): (Long, Long, Long) = {
    val p = pointerPath(storeDir)
    if (!Files.exists(p)) (0L, -1L, 0L)
    else {
      val parts = Files.readString(p).trim.split(" ")
      (parts(0).toLong, parts(1).toLong, parts(2).toLong)
    }
  }

  private def writePointer(storeDir: String, version: Long,
      batchId: Long, nDocs: Long): Unit = {
    val tmp = Paths.get(storeDir, "_CURRENT.tmp")
    Files.writeString(tmp, s"$version $batchId $nDocs")
    Files.move(tmp, pointerPath(storeDir),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Fold ONE document batch (id, text) into the store — pure
    * function of (committed store, batch, batchId); replays are
    * no-ops. One tokenize + trigram aggregation over the BATCH, one
    * type-keyed merge with the committed counts — nothing
    * corpus-sized is rescanned.
    */
  def applyBatch(batch: DataFrame, id: String, text: Column,
      storeDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    Files.createDirectories(Paths.get(storeDir))
    val (curVer, lastBatch, nDocs) = readPointer(storeDir)
    if (batchId <= lastBatch) return
    val batchCounts = Curation.knTrigrams(batch, id, text)
      .groupBy("w1", "w2", "w3")
      .agg(count(lit(1)).cast("double").as("c3"))
    val cur =
      if (curVer == 0L) spark.createDataFrame(
        java.util.Collections.emptyList[Row](), batchCounts.schema)
      else spark.read.parquet(s"$storeDir/state-$curVer")
    // c3 values are integer-valued doubles — sums exact in any order
    val merged = cur.unionByName(batchCounts)
      .groupBy("w1", "w2", "w3")
      .agg(sum(col("c3")).as("c3"))
    val next = curVer + 1
    merged.write.mode(SaveMode.Overwrite).parquet(s"$storeDir/state-$next")
    writePointer(storeDir, next, batchId, nDocs + batch.count())
    // gc superseded states (keep the previous one as the crash floor,
    // the StreamingPostings discipline)
    for (old <- 1L until (next - 1L)) {
      val d = Paths.get(storeDir, s"state-$old")
      if (Files.isDirectory(d))
        StateStore.deleteTree(d)
    }
  }

  /** Score a document batch against the store's model — the shared
    * KN stages over the committed counts; bit-equal to the batch
    * operator over everything ingested. An empty/virgin store yields
    * a well-formed empty result.
    */
  def knScoreFromStore(spark: SparkSession, storeDir: String,
      docs: DataFrame, id: String, text: Column,
      discount: Double = 0.75): DataFrame = {
    val (ver, _, _) = readPointer(storeDir)
    val tris = Curation.knTrigrams(docs, id, text)
    if (ver == 0L)
      return tris.where(lit(false))
        .groupBy(col(id))
        .agg(count(lit(1)).as("n_trigrams"),
          lit(null).cast("double").as("avg_logprob_kn"))
    val t3 = spark.read.parquet(s"$storeDir/state-$ver")
    Curation.knScoreDocs(tris, Curation.knModelLogProbs(t3, discount), id)
  }

  /** The streaming sink: exactly-once per micro-batch via
    * foreachBatch; [[knScoreFromStore]] between batches equals the
    * batch KN score over everything ingested so far.
    */
  def maintain(stream: DataFrame, id: String, text: Column,
      storeDir: String, checkpoint: String): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, id, text, storeDir, batchId)
      }
}
