package graft.streaming

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress

/** Live pipeline-health HTTP endpoint — parity with the reference's
  * dashboard webserver (`motorway/webserver.py:17-148`), which serves
  * controller stats as JSON for the bundled UI. Spark already computes
  * the numbers ([[PipelineStatsListener]], fed by streaming progress
  * events); this exposes them at `GET /api/status/` with the same
  * per-group counts, latency stats, and `available|busy|failing` status
  * heuristic. JDK built-in httpserver: no dependency, runs on the
  * driver alongside the streaming queries (where the listener lives).
  */
final class StatsServer(listener: PipelineStatsListener, port: Int = 0) {
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  server.createContext("/api/status/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val body = listener.snapshotJson.getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, body.length.toLong)
      val os = ex.getResponseBody
      try os.write(body) finally os.close()
    }
  })
  server.setExecutor(null) // serve on the accept thread; status is tiny
  server.start()

  /** Actual port (when constructed with port = 0, the OS picks one). */
  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)
}
