package graft.streaming

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** ST9: the reference's `/metrics` scrape surface
  * (/root/reference/internal/metrics/metrics.go:40-57 — an HTTP
  * server goroutine serving Prometheus text format). JDK-builtin
  * HttpServer on a daemon thread; serves the IngestionMetrics
  * listener's counters/histogram in Prometheus-ish text form.
  */
final class MetricsServer(metrics: IngestionMetrics, port: Int) {

  private val server: HttpServer = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/metrics", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val body = metrics.render().getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "text/plain; version=0.0.4")
      ex.sendResponseHeaders(200, body.length.toLong)
      val os = ex.getResponseBody
      try os.write(body) finally os.close()
    }
  })
  server.setExecutor(null) // serve on the dispatcher thread, like promhttp's default

  /** Bound port (useful when constructed with port 0 in tests). */
  def boundPort: Int = server.getAddress.getPort

  def start(): MetricsServer = { server.start(); this }
  def stop(): Unit = server.stop(0)
}
