package graft.streaming

import graft.operators.Curation
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** ST23 — streaming maintenance of the X30 collocation counts: the
  * phrase table served live. A crawl-ingest pipeline wants "what are
  * the corpus' multi-word units / boilerplate phrases RIGHT NOW"
  * without rescanning everything ingested; the X30 state — one
  * integer count per (kind, a, b) where kind 'u' is unigrams and 'b'
  * adjacent bigrams — is trivially SUMMABLE, so each micro-batch
  * folds by addition and the committed counts after batch k are
  * bit-identical to one batch pass over batches 0..k (asserted per
  * batch by the spec). The read face runs
  * [[Curation.collocationsFromCounts]] UNCHANGED on the committed
  * state, so PMI/NPMI parity with the batch operator is STRUCTURAL
  * (totals N and M are derived sums of the state, never separate
  * state that could drift).
  *
  * Scale shape: each batch pays one explode + two hash aggregates
  * over its own rows; the merge touches vocabulary + pair-table
  * sized state, bounded by the corpus' DISTINCT token/bigram sets,
  * not ingest volume. Store layout and commit protocol are the
  * family's verbatim: `state-<version>/` parquet under an
  * atomically-moved `_CURRENT` pointer, batchId replay guard,
  * DOWNWARD-walk O(1) crash-self-healing cleanup.
  */
object StreamingCollocations {

  /** (version, lastAppliedBatchId); (0, -1) before the first commit. */
  def readPointer(stateDir: String): (Long, Long) =
    StateStore.readPointer(stateDir)

  /** The committed count state (raw [[Curation.collocationCounts]]
    * rows). Empty-safe.
    */
  def readState(spark: SparkSession, stateDir: String,
      template: DataFrame): DataFrame =
    StateStore.readVersioned(spark, stateDir, template)

  /** Read face: the live phrase table — PMI/NPMI at the current
    * commit point, [[Curation.collocationsFromCounts]] verbatim.
    */
  def currentCollocations(spark: SparkSession, stateDir: String,
      minCount: Int, template: DataFrame): DataFrame =
    Curation.collocationsFromCounts(
      readState(spark, stateDir, template), minCount)

  /** Fold ONE ingest batch into the store; replays are no-ops. */
  def applyBatch(batch: DataFrame, text: Column, stateDir: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    StateStore.commit(stateDir, batchId) { (_, next) =>
      val partial = Curation.collocationCounts(batch, text)
      val cur = readState(spark, stateDir, partial)
      val merged = Curation.mergeCollocationCounts(cur.unionByName(partial))
      merged.write.mode(SaveMode.Overwrite).parquet(s"$stateDir/state-$next")
    }
  }

  /** The streaming sink: exactly-once per micro-batch; the live
    * phrase table between batches equals the batch operator over
    * everything ingested.
    */
  def maintain(stream: DataFrame, text: Column, stateDir: String,
      checkpoint: String): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, text, stateDir, batchId)
      }
}
