package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.{Duration, Instant}
import java.util.concurrent.{LinkedBlockingQueue, ThreadPoolExecutor, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/** One ingest micro-batch in span form — the typed record behind both
  * the JSON span log line and the OTLP export.
  */
final case class IngestSpan(
    queryId: String, runId: String, batchId: Long,
    rows: Long, durationMs: Long, timestamp: String)

/** ST9: REAL OTLP trace export, matching the reference's
  * otlptracehttp init (/root/reference/internal/tracing/tracing.go:19-51:
  * endpoint from OTEL_EXPORTER_OTLP_ENDPOINT else localhost:4318,
  * insecure HTTP, batched spans with a service.name resource).
  *
  * No OTel SDK exists in this dependency set, and none is needed: the
  * OTLP/HTTP JSON encoding (the canonical protobuf-JSON mapping of
  * `ExportTraceServiceRequest`, OTLP spec 1.x) is a stable public wire
  * format, POSTed to `/v1/traces` with Content-Type application/json —
  * exactly what `otlptracehttp.WithInsecure` speaks. One span per
  * micro-batch:
  *   traceId  ← streaming query id (a UUID → 32 hex chars; stable for
  *              the query's lifetime, the reference's trace-per-flow
  *              analogue)
  *   spanId   ← first 8 hex of runId ++ batchId as 8 hex (16 hex,
  *              unique per restart × batch)
  *   name     ← "ingest_batch", kind INTERNAL
  *   start/end ← batch timestamp + triggerExecution duration
  *
  * Export failures are counted and swallowed (`exportErrors`) — a
  * tracing outage must never take down ingestion, same stance as the
  * SDK's background batcher dropping on full queue.
  *
  * Export is ASYNCHRONOUS: [[apply]] is called from Spark's shared
  * streaming listener-bus thread (IngestionMetrics.onQueryProgress),
  * where a blocking POST against a slow or down collector would stall
  * every listener in the session and make Spark drop listener events.
  * Spans are handed to a single daemon worker through a bounded queue
  * and DROPPED (counted in `droppedTotal`) when it is full — the same
  * stance as otlptracehttp's `WithBatcher` background queue
  * (tracing.go:39-44). [[flush]] drains the queue for orderly
  * shutdown and deterministic tests.
  */
final class OtlpSpanExporter(
    endpoint: String = sys.env.getOrElse("OTEL_EXPORTER_OTLP_ENDPOINT", "localhost:4318"),
    serviceName: String = "graft-engine",
    requestTimeoutMs: Long = 10000,
    queueCapacity: Int = 512) extends (IngestSpan => Unit) with Serializable {

  def url: String = s"http://$endpoint/v1/traces"

  val exportedTotal = new AtomicLong(0L)
  val exportErrors = new AtomicLong(0L)
  val droppedTotal = new AtomicLong(0L)

  /** Driver-side only (listener-bus producer, one worker consumer);
    * transient so an accidental closure capture never ships threads.
    */
  @transient private lazy val worker: ThreadPoolExecutor = {
    val ex = new ThreadPoolExecutor(
      1, 1, 30, TimeUnit.SECONDS,
      new LinkedBlockingQueue[Runnable](queueCapacity),
      (r: Runnable) => {
        val t = new Thread(r, "otlp-span-exporter")
        t.setDaemon(true)
        t
      },
      // full queue → drop the span, never block the listener bus
      (_: Runnable, _: ThreadPoolExecutor) => droppedTotal.incrementAndGet(): Unit)
    ex.allowCoreThreadTimeOut(true)
    ex
  }

  /** Enqueue; never blocks, never throws. */
  override def apply(s: IngestSpan): Unit =
    worker.execute(() => post(s))

  /** Wait until every enqueued span has been attempted (exported,
    * errored, or dropped). Returns false on timeout.
    */
  def flush(timeoutMs: Long = 10000): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (worker.getQueue.size() > 0 || worker.getActiveCount > 0) {
      if (System.nanoTime() > deadline) return false
      Thread.sleep(10)
    }
    true
  }

  private def post(s: IngestSpan): Unit = {
    val body = OtlpSpanExporter.encode(serviceName, s)
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    try {
      val resp = OtlpSpanExporter.client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 == 2) exportedTotal.incrementAndGet()
      else exportErrors.incrementAndGet()
    } catch { case _: Exception => exportErrors.incrementAndGet() }
  }
}

object OtlpSpanExporter {

  /** Per-JVM pooled client (exporters run on the driver's listener
    * bus thread; one client suffices and keeps connections alive).
    */
  lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(5))
    .version(HttpClient.Version.HTTP_1_1)
    .build()

  /** queryId UUID → 32-hex traceId; runId+batchId → 16-hex spanId. */
  def traceId(queryId: String): String = {
    val hex = queryId.replace("-", "").toLowerCase.filter(c => Character.digit(c, 16) >= 0)
    (hex + "0" * 32).take(32)
  }
  def spanId(runId: String, batchId: Long): String = {
    val runHex = (runId.replace("-", "").toLowerCase + "0" * 8).take(8)
    f"$runHex%s${batchId & 0xFFFFFFFFL}%08x"
  }

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }

  /** OTLP/JSON `ExportTraceServiceRequest` with one span. Nano
    * timestamps are JSON STRINGS per the protobuf-JSON int64 mapping.
    */
  def encode(serviceName: String, s: IngestSpan): String = {
    val startNanos =
      try Instant.parse(s.timestamp).toEpochMilli * 1000000L
      catch { case _: Exception => 0L }
    val endNanos = startNanos + s.durationMs * 1000000L
    def strAttr(k: String, v: String) = s"""{"key":"$k","value":{"stringValue":"${esc(v)}"}}"""
    def intAttr(k: String, v: Long) = s"""{"key":"$k","value":{"intValue":"$v"}}"""
    s"""{"resourceSpans":[{"resource":{"attributes":[${strAttr("service.name", serviceName)}]},""" +
      s""""scopeSpans":[{"scope":{"name":"graft.streaming"},"spans":[{""" +
      s""""traceId":"${traceId(s.queryId)}","spanId":"${spanId(s.runId, s.batchId)}",""" +
      s""""name":"ingest_batch","kind":1,""" +
      s""""startTimeUnixNano":"$startNanos","endTimeUnixNano":"$endNanos",""" +
      s""""attributes":[${intAttr("batch_id", s.batchId)},${intAttr("rows", s.rows)},""" +
      s"""${intAttr("duration_ms", s.durationMs)},${strAttr("query_id", s.queryId)},""" +
      s"""${strAttr("run_id", s.runId)}]}]}]}]}"""
  }
}
