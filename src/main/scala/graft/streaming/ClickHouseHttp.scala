package graft.streaming

import graft.pipeline.IngestConfig
import java.io.IOException
import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.SparkContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.util.LongAccumulator

/** Cluster-wide sink counters: Spark [[LongAccumulator]]s captured in
  * the sink closure, so executor-side increments merge back to the
  * driver on task completion — the piece the per-JVM statics can't do
  * off local mode. Create once driver-side via
  * [[SinkAccumulators.apply]] and pass to [[ClickHouseHttp]].
  *
  * Semantics: Spark merges accumulator updates from SUCCESSFUL tasks
  * only, so these are COMMITTED counts — a failed-and-retried
  * partition contributes exactly once (the statics, incremented
  * per-attempt, double-count retries; the two views are complementary,
  * not redundant). The same rule is why there is no `errors`
  * accumulator: every sink error path throws and fails its task, so
  * its update would always be discarded — error totals live in the
  * per-executor statics (scrape each executor) and in Spark's own
  * task-failure metrics.
  */
final case class SinkAccumulators(rows: LongAccumulator, posts: LongAccumulator)

object SinkAccumulators {
  def apply(sc: SparkContext): SinkAccumulators = SinkAccumulators(
    sc.longAccumulator("clickhouse.rows_inserted"),
    sc.longAccumulator("clickhouse.posts_total"))
}

/** S5 concrete transport: the reference's ClickHouse HTTP JSONEachRow
  * insert (/root/reference/internal/ingestion/clickhouse.go:26-70 —
  * build endpoint, optional basic auth, POST, non-200 → error, latency
  * + error metrics), restructured for Spark's execution model:
  *
  *  - ONE pooled `java.net.http.HttpClient` per executor JVM
  *    ([[ClickHouseHttp.client]]) instead of the reference's
  *    `&http.Client{}` per request (clickhouse.go:52) — connection
  *    reuse is the first thing a 1000-executor fan-in needs, or the
  *    ClickHouse front-end drowns in TCP handshakes.
  *  - one POST per PARTITION of a micro-batch (via
  *    [[Sinks.jsonEachRowPost]]), not per row — the reference's
  *    one-row-per-POST loop is its throughput ceiling (SURVEY.md §6).
  *  - failure → exception: Spark retries the task, so delivery is
  *    at-least-once; downstream stays idempotent via `_lsn` versioning
  *    (ST3), same contract as the JDBC path.
  *
  * The case class is a plain serializable `String => Unit`, so it
  * ships to executors as a closure; the client and metrics live in the
  * companion (per-JVM statics, never serialized).
  *
  * Endpoint shape matches clickhouse.go:109-110 exactly:
  * `http://host:port/?database=<db>&query=INSERT%20INTO%20<table>%20FORMAT%20JSONEachRow`.
  */
final case class ClickHouseHttp(
    host: String,
    database: String = "",
    table: String = "",
    user: String = "",
    password: String = "",
    requestTimeoutMs: Long = 30000,
    acc: Option[SinkAccumulators] = None) extends (String => Unit) with Serializable {

  private def cfg = IngestConfig(host = host, database = database, table = table)

  /** clickhouse.go:109-110: db defaulting appdb, table app.users_cur,
    * query URL-encoded (Go's url.QueryEscape encodes space as '+';
    * URLEncoder matches).
    */
  def endpoint: String = {
    val q = URLEncoder.encode(s"INSERT INTO ${cfg.tableOrDefault} FORMAT JSONEachRow", "UTF-8")
    val db = URLEncoder.encode(cfg.databaseOrDefault, "UTF-8")
    s"http://${cfg.hostPort}/?database=$db&query=$q"
  }

  /** POST one JSONEachRow body (newline-joined objects). Mirrors
    * doJSONEachRowPOST: Content-Type header, basic auth only when BOTH
    * user and password are set (clickhouse.go:48-50), latency observed
    * on every attempt, errors counted then rethrown, non-200 → error.
    */
  override def apply(body: String): Unit = {
    // [[Sinks.jsonEachRowPost]] never posts empty partitions, but a
    // direct caller might: an empty body is zero rows, not one — skip
    // the round-trip entirely rather than miscounting newline+1
    if (body.isEmpty) return
    val b = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofMillis(requestTimeoutMs))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
    if (user.nonEmpty && password.nonEmpty)
      b.header("Authorization", "Basic " + Base64.getEncoder.encodeToString(
        s"$user:$password".getBytes(StandardCharsets.UTF_8)))
    val t0 = System.nanoTime()
    val resp =
      try ClickHouseHttp.client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      catch { case e: Exception =>
        ClickHouseHttp.observe(System.nanoTime() - t0)
        ClickHouseHttp.insertErrors.incrementAndGet()
        throw new IOException(s"http post error: ${e.getMessage}", e)
      }
    ClickHouseHttp.observe(System.nanoTime() - t0)
    if (resp.statusCode() != 200) {
      ClickHouseHttp.insertErrors.incrementAndGet()
      throw new IOException(
        s"clickhouse returned status: ${resp.statusCode()} ${resp.body().take(200)}")
    }
    ClickHouseHttp.postsTotal.incrementAndGet()
    // reference RowsInserted.Inc() is per-POST == per-row there; here a
    // POST carries a whole partition, so count actual JSON lines
    val rows = body.count(_ == '\n') + 1L
    ClickHouseHttp.rowsInserted.addAndGet(rows)
    acc.foreach { a => a.posts.add(1L); a.rows.add(rows) }
  }
}

object ClickHouseHttp {

  /** Per-JVM pooled client: HTTP/1.1 keep-alive connections are reused
    * across requests and partitions. Executors each build exactly one.
    */
  lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .version(HttpClient.Version.HTTP_1_1)
    .build()

  // the reference's three sink metrics (internal/metrics/metrics.go:11-38):
  // clickhouse_insert_errors_total, rows_inserted, insert latency histogram.
  // SCOPE: per-JVM statics incremented where the POST runs (executors).
  // In local mode driver == executor, so [[render]] served from the
  // driver's MetricsServer sees them; in a multi-executor deployment
  // the driver's copies stay zero — pass [[SinkAccumulators]] to the
  // sink for cluster-wide counts (task-merged back to the driver),
  // and treat the statics + latency histogram as per-executor detail
  // for executor-side scrapes.
  val insertErrors = new AtomicLong(0L)
  val rowsInserted = new AtomicLong(0L)
  val postsTotal = new AtomicLong(0L)

  /** Prometheus DefBuckets in seconds (metrics.go uses the default
    * histogram buckets), stored non-cumulative with one overflow cell.
    */
  val latencyBoundsSec: Array[Double] =
    Array(0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1, 2.5, 5, 10)
  val latencyBuckets: Array[AtomicLong] =
    Array.fill(latencyBoundsSec.length + 1)(new AtomicLong(0L))
  val latencySumNanos = new AtomicLong(0L)

  private[graft] def observe(nanos: Long): Unit = {
    val sec = nanos / 1e9
    val idx = latencyBoundsSec.indexWhere(sec <= _) match {
      case -1 => latencyBoundsSec.length
      case i => i
    }
    latencyBuckets(idx).incrementAndGet()
    latencySumNanos.addAndGet(nanos)
  }

  private[graft] def resetMetrics(): Unit = { // test isolation
    insertErrors.set(0); rowsInserted.set(0); postsTotal.set(0)
    latencyBuckets.foreach(_.set(0)); latencySumNanos.set(0)
  }

  /** Prometheus text form of the sink counters, same 0.0.4 shape as
    * [[IngestionMetrics.render]] — serve both from one [[MetricsServer]].
    */
  def render(): String = {
    val counts = latencyBuckets.map(_.get)
    val cumulative = counts.scanLeft(0L)(_ + _).tail
    val total = cumulative.last
    val hist = latencyBoundsSec.zipWithIndex
      .map { case (bnd, i) => s"""clickhouse_insert_latency_seconds_bucket{le="$bnd"} ${cumulative(i)}""" }
      .mkString("\n")
    s"""clickhouse_insert_errors_total ${insertErrors.get}
       |rows_inserted ${rowsInserted.get}
       |clickhouse_posts_total ${postsTotal.get}
       |$hist
       |clickhouse_insert_latency_seconds_bucket{le="+Inf"} $total
       |clickhouse_insert_latency_seconds_count $total
       |clickhouse_insert_latency_seconds_sum ${latencySumNanos.get / 1e9}""".stripMargin
  }

  /** The full S5 streaming path over this transport: translate rows →
    * JSONEachRow wire bytes → one POST per non-empty partition per
    * micro-batch. Checkpointed, at-least-once; a mid-batch retry may
    * re-POST partitions — ClickHouse-side idempotency comes from the
    * versioned engine (`_lsn`), exactly the reference's contract.
    */
  def append(writer: DataFrame, checkpoint: String, sink: ClickHouseHttp): DataStreamWriter[Row] =
    writer.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sinks.jsonEachRowPost(Sinks.validRows(batch), sink)
      }
}
