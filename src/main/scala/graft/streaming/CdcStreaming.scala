package graft.streaming

import graft.pipeline.Debezium
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** S2/ST2/ST3/ST7: the reference's CDC consume loop as a Structured
  * Streaming pipeline (SURVEY.md §2.1 S2, §2.9).
  *
  * Reference (/root/reference/internal/ingestion/cdc.go):
  *  - consumer-group Kafka read of Debezium envelopes (cdc.go:25-55)
  *    → [[kafkaSource]]; checkpointed offsets upgrade the reference's
  *    commit-on-read at-most-once to at-least-once (ST3, documented
  *    semantic improvement — replays are idempotent because rows carry
  *    `_lsn` and the current-state view dedups by version).
  *  - per-message parse → translate → insert (cdc.go:48-84) →
  *    [[translate]] reuses the batch pipeline unchanged: the SAME
  *    Catalyst expressions run in micro-batch (ST2 — Spark's
  *    batch/streaming unification is the point).
  *
  * State management at scale (ST7): both stateful operators are
  * watermark-bounded so state size is O(keys seen within the
  * watermark), not O(history) — mandatory at 100 TB.
  */
object CdcStreaming {

  /** S2: the exact Kafka source option set, exposed so a spec can pin
    * the contract without a broker (a silent regression in any of
    * these changes delivery semantics):
    *  - `startingOffsets=earliest`: first run consumes the topic from
    *    the start, like the reference's fresh consumer group
    *  - `maxOffsetsPerTrigger`: micro-batch analogue of the
    *    reference's MaxBytes fetch bound (cdc.go:41-42)
    *  - `failOnDataLoss=false`: expired/compacted offsets resume from
    *    what remains instead of killing the stream — the reference's
    *    consumer rejoins at the broker's earliest retained offset the
    *    same way (cdc.go:25-55 never treats lost offsets as fatal)
    *  - `kafka.group.id`: consumer-group identity (cdc.go:36-43);
    *    Spark manages offsets itself via checkpoints, the group id is
    *    for broker-side quota/monitoring attribution
    */
  def kafkaSourceOptions(
      brokers: String, topic: String,
      maxOffsetsPerTrigger: Long = 10000L,
      groupId: Option[String] = None): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> brokers,
      "subscribe" -> topic,
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "false",
      "maxOffsetsPerTrigger" -> maxOffsetsPerTrigger.toString) ++
      groupId.map("kafka.group.id" -> _)

  /** S2: Kafka Debezium source. */
  def kafkaSource(
      spark: SparkSession, brokers: String, topic: String,
      maxOffsetsPerTrigger: Long = 10000L,
      groupId: Option[String] = None): DataFrame =
    spark.readStream
      .format("kafka")
      .options(kafkaSourceOptions(brokers, topic, maxOffsetsPerTrigger, groupId))
      .load()

  /** S2-file: broker-free CDC transport — a directory of JSON-line
    * files stands in for the Kafka topic (CLI `--brokers file:<dir>`),
    * mirroring the reference's local-dev escape hatch
    * (KAFKA_FORCE_LOCAL, /root/reference/internal/ingestion/cdc.go:19-34)
    * without any broker in the loop. Each line is either
    *  - a bare Debezium envelope — the Kafka record VALUE bytes
    *    (cdc.go:62-67), key null; or
    *  - a keyed record `{"key":"<key json>","value":"<envelope json>"}`
    *    when the delete-path key fallback matters (cdc.go:126-134).
    * Both shapes may mix in one directory: a line that parses to the
    * keyed-record schema contributes its fields, anything else falls
    * back to being the value itself (a bare envelope has neither a
    * `key` nor a string `value` top-level field, so both probes null
    * out and `coalesce` keeps the raw line).
    *
    * Output columns are exactly what [[translate]] consumes from the
    * Kafka source (`key`/`value` strings), so the whole downstream
    * pipeline — parse, translate, sink, metrics — runs unchanged.
    * `maxFilesPerTrigger` bounds the micro-batch like
    * `maxOffsetsPerTrigger` does on the Kafka arm.
    */
  def fileSource(
      spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16): DataFrame = {
    val rec = from_json(col("value"), "key STRING, value STRING",
      Map.empty[String, String])
    spark.readStream
      .format("text")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir) // text source column is `value` = the raw line
      .select(
        rec.getField("key").as("key"),
        coalesce(rec.getField("value"), col("value")).as("value"))
  }

  /** ST2: streaming translate — identical expressions as batch
    * (Debezium.translateRows works on a streaming df as-is). Input
    * needs `value`/`key` binary or string columns (Kafka shape).
    */
  def translate(kafkaDf: DataFrame): DataFrame =
    Debezium.translateRows(
      kafkaDf,
      col("value").cast("string"),
      col("key").cast("string"))

  /** ST7a: bounded stateful dedup of CDC replays — drop rows whose
    * (id, _lsn) was already seen within the watermark. This is the
    * at-least-once → effectively-once guard in front of an
    * append-only sink.
    */
  def dedupReplays(rows: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    rows
      .withWatermark("_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("id", "_lsn")

  case class CdcRow(
      id: Long, name: String, email: String,
      is_deleted: Int, _op: Int, _lsn: Long, _ts: java.sql.Timestamp)

  /** ST7b: full current-state view maintained in keyed state — the
    * streaming form of VersionedDedup.currentState (ReplacingMergeTree
    * FINAL). Each key keeps only its max-`_lsn` row; emits the new
    * current row whenever it changes, tombstone rows (is_deleted=1)
    * included so sinks can delete. Processing-time timeout expires
    * idle keys so state is bounded for an evolving keyspace.
    */
  def currentStateStream(
      spark: SparkSession, rows: DataFrame,
      idleTimeout: String = "30 minutes"): Dataset[CdcRow] = {
    import spark.implicits._
    rows.as[CdcRow]
      .groupByKey(_.id)
      .flatMapGroupsWithState[CdcRow, CdcRow](
        OutputMode.Update(), GroupStateTimeout.ProcessingTimeTimeout()) {
        case (_, it: Iterator[CdcRow], state: GroupState[CdcRow]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            def later(a: CdcRow, b: CdcRow): CdcRow =
              if (a._lsn > b._lsn || (a._lsn == b._lsn && a._op >= b._op)) a else b
            val incoming = it.reduceOption(later)
            val best = (state.getOption.toSeq ++ incoming.toSeq).reduceOption(later)
            state.setTimeoutDuration(idleTimeout)
            best match {
              case Some(b) if !state.getOption.contains(b) =>
                state.update(b); Iterator.single(b)
              case _ => Iterator.empty
            }
          }
      }
  }
}
