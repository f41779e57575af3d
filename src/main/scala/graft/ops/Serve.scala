package graft.ops

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.DataFrame

/** The `serve` sink (reference
  * `/root/reference/libtenzir/builtins/operators/serve.cpp`: buffers a
  * pipeline's result and hands it out in pages to repeated HTTP requests,
  * each response carrying a continuation token).
  *
  * Spark mapping: the result stays distributed until a page is needed —
  * `toLocalIterator` streams one partition at a time to the driver, so
  * serving never materializes the full result (the reference caps its buffer
  * at 64Ki events for the same reason; `serve.cpp` `max_queued_events`).
  * Pages are JSON-line arrays; `GET /?token=<n>` returns
  * `{"token": n, "next": n+1|null, "events": [...]}` — sequential paging
  * only, like the reference's continuation-token contract.
  */
class Serve private (server: HttpServer) {
  /** Bound port (useful when constructed with port 0). */
  def port: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}

object Serve {

  /** Start serving `df` (as JSON lines) on `port` (0 = ephemeral). */
  def start(df: DataFrame, port: Int, pageSize: Int = 1024): Serve = {
    val it = df.toJSON.toLocalIterator()
    var nextToken = 0
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val token = q.split("&").collectFirst {
        case s if s.startsWith("token=") => s.substring(6).toInt
      }.getOrElse(0)
      val (status, body) = synchronized {
        if (token != nextToken) {
          (409, s"""{"error":"expected token $nextToken"}""")
        } else {
          val events = new StringBuilder
          var n = 0
          while (n < pageSize && it.hasNext) {
            if (n > 0) events.append(',')
            events.append(it.next())
            n += 1
          }
          nextToken += 1
          val next = if (it.hasNext) nextToken.toString else "null"
          (200, s"""{"token":$token,"next":$next,"events":[$events]}""")
        }
      }
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    new Serve(server)
  }
}
