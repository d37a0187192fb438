package graft

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentLinkedQueue
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.streaming.{IngestSpan, IngestionMetrics, OtlpSpanExporter}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import scala.jdk.CollectionConverters._

/** ST9: real OTLP/HTTP span export against a local collector stub —
  * the functional equivalent of the reference's otlptracehttp init
  * (internal/tracing/tracing.go:19-51).
  */
class OtlpSpec extends SparkSpec {
  import spark.implicits._

  private def withCollector(status: Int)(f: (Int, ConcurrentLinkedQueue[String]) => Unit): Unit = {
    val bodies = new ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/v1/traces", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        bodies.add(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
        ex.sendResponseHeaders(status, -1)
        ex.close()
      }
    })
    server.start()
    try f(server.getAddress.getPort, bodies) finally server.stop(0)
  }

  private val span = IngestSpan(
    queryId = "e18e9aae-6004-415c-9df3-82a52ab0a341",
    runId = "0c4c9b2f-1111-2222-3333-444455556666",
    batchId = 7L, rows = 42L, durationMs = 125L,
    timestamp = "2024-03-01T12:00:00.500Z")

  test("encode emits OTLP/JSON with derived ids, nano times and span attributes") {
    val body = OtlpSpanExporter.encode("graft-engine", span)
    // traceId = query UUID without dashes (32 hex); spanId = 8 hex of
    // runId ++ batchId as 8 hex
    assert(body.contains(""""traceId":"e18e9aae6004415c9df382a52ab0a341""""))
    assert(body.contains(""""spanId":"0c4c9b2f00000007""""))
    assert(body.contains(""""name":"ingest_batch""""))
    // 2024-03-01T12:00:00.500Z epoch millis = 1709294400500
    assert(body.contains(""""startTimeUnixNano":"1709294400500000000""""))
    assert(body.contains(""""endTimeUnixNano":"1709294400625000000""""))
    assert(body.contains("""{"key":"service.name","value":{"stringValue":"graft-engine"}}"""))
    assert(body.contains("""{"key":"rows","value":{"intValue":"42"}}"""))
    assert(body.contains("""{"key":"batch_id","value":{"intValue":"7"}}"""))
    assert(body.contains("""{"key":"duration_ms","value":{"intValue":"125"}}"""))
    assert(body.contains(""""resourceSpans""""))
    assert(body.contains(""""scopeSpans""""))
  }

  test("exporter POSTs to /v1/traces and counts exports; failures counted, never thrown") {
    withCollector(200) { (port, bodies) =>
      val exp = new OtlpSpanExporter(endpoint = s"127.0.0.1:$port")
      exp(span)
      assert(exp.flush(10000), "async export must drain")
      assert(exp.exportedTotal.get === 1L)
      assert(exp.exportErrors.get === 0L)
      assert(bodies.asScala.head.contains(""""name":"ingest_batch""""))
    }
    withCollector(503) { (port, _) =>
      val exp = new OtlpSpanExporter(endpoint = s"127.0.0.1:$port")
      exp(span) // collector down → counted, swallowed
      assert(exp.flush(10000))
      assert(exp.exportErrors.get === 1L)
    }
    val dead = new OtlpSpanExporter(endpoint = "127.0.0.1:1")
    dead(span)
    assert(dead.flush(10000))
    assert(dead.exportErrors.get === 1L)
  }

  test("async exporter never blocks the caller: slow collector → bounded queue drops, apply returns fast") {
    // collector that stalls 2s per request: a synchronous exporter
    // would hold the listener-bus thread 2s per batch
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/v1/traces", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        Thread.sleep(2000)
        ex.sendResponseHeaders(200, -1); ex.close()
      }
    })
    server.start()
    try {
      val exp = new OtlpSpanExporter(
        endpoint = s"127.0.0.1:${server.getAddress.getPort}", queueCapacity = 2)
      val t0 = System.nanoTime()
      (1 to 10).foreach(i => exp(span.copy(batchId = i.toLong)))
      val callerMs = (System.nanoTime() - t0) / 1000000L
      assert(callerMs < 1000, s"apply must not block on the POST (took ${callerMs}ms)")
      // 1 in flight + 2 queued; the other 7 dropped on the full queue
      assert(exp.droppedTotal.get >= 1L, "full queue must drop, not block")
      assert(exp.flush(30000))
      assert(exp.exportedTotal.get + exp.exportErrors.get + exp.droppedTotal.get === 10L)
    } finally server.stop(0)
  }

  test("IngestionMetrics with an OtlpSpanExporter ships one real span per micro-batch") {
    withCollector(200) { (port, bodies) =>
      implicit val sq = spark.sqlContext
      val exp = new OtlpSpanExporter(endpoint = s"127.0.0.1:$port", serviceName = "graft-test")
      val m = new IngestionMetrics(spanSink = _ => (), spanExporter = Some(exp))
      spark.streams.addListener(m)
      try {
        val in = MemoryStream[Long]
        val q = in.toDF().writeStream.format("noop").start()
        in.addData(1L, 2L, 3L)
        q.processAllAvailable()
        q.stop(); q.awaitTermination(10000)
        val deadline = System.currentTimeMillis() + 10000
        while (bodies.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
        val b = bodies.asScala.find(_.contains(""""rows","value":{"intValue":"3"}"""))
        assert(b.isDefined, s"no 3-row span among ${bodies.size} exports")
        assert(b.get.contains(""""stringValue":"graft-test""""))
        assert("\"traceId\":\"[0-9a-f]{32}\"".r.findFirstIn(b.get).isDefined)
        assert("\"spanId\":\"[0-9a-f]{16}\"".r.findFirstIn(b.get).isDefined)
      } finally spark.streams.removeListener(m)
    }
  }
}
