package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** ST9: ingestion observability — the reference's four Prometheus
  * quantities (/root/reference/internal/metrics/metrics.go:11-38):
  *   events_generated_total, clickhouse_insert_errors_total,
  *   clickhouse_insert_latency_seconds (histogram), rows_inserted.
  * mapped onto Structured Streaming's progress events (SURVEY.md §3.3):
  *   rows ingested   ← progress.numInputRows (cumulative counter)
  *   insert latency  ← batch durationMs (histogram buckets below)
  *   errors          ← onQueryTerminated with exception
  *   rate            ← processedRowsPerSecond (gauge)
  * Attach with `spark.streams.addListener(new IngestionMetrics)`; a
  * Prometheus scrape surface is Spark's own servlet
  * (spark.ui.prometheus.enabled) — this listener is the engine-level
  * mirror of the reference's counters, queryable in-process.
  */
class IngestionMetrics extends StreamingQueryListener {

  val rowsTotal = new AtomicLong(0L)
  val batchesTotal = new AtomicLong(0L)
  val errorsTotal = new AtomicLong(0L)
  val lastRowsPerSecond = new AtomicReference[Double](0.0)

  /** Prometheus-DefBuckets-shaped latency histogram (5ms..10s),
    * matching the reference's insert-latency buckets
    * (internal/metrics/metrics.go:18-24).
    */
  val bucketBoundsMs: Array[Long] =
    Array(5, 10, 25, 50, 100, 250, 500, 1000, 2500, 5000, 10000)
  val latencyBuckets: Array[AtomicLong] =
    Array.fill(bucketBoundsMs.length + 1)(new AtomicLong(0L))

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    rowsTotal.addAndGet(p.numInputRows)
    batchesTotal.incrementAndGet()
    lastRowsPerSecond.set(p.processedRowsPerSecond)
    val ms = Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L)
    val idx = bucketBoundsMs.indexWhere(ms <= _) match {
      case -1 => bucketBoundsMs.length
      case i => i
    }
    latencyBuckets(idx).incrementAndGet()
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    if (e.exception.isDefined) errorsTotal.incrementAndGet()

  /** Prometheus-text-format-ish dump (scrape/debug surface). */
  def render(): String = {
    val hist = bucketBoundsMs.zipWithIndex
      .map { case (b, i) => s"""ingest_batch_ms_bucket{le="$b"} ${latencyBuckets(i).get}""" }
      .mkString("\n")
    s"""ingest_rows_total ${rowsTotal.get}
       |ingest_batches_total ${batchesTotal.get}
       |ingest_errors_total ${errorsTotal.get}
       |ingest_rows_per_second ${lastRowsPerSecond.get}
       |$hist
       |ingest_batch_ms_bucket{le="+Inf"} ${latencyBuckets.last.get}""".stripMargin
  }
}
