package graft.sources

import java.io.DataOutputStream
import java.net.{HttpURLConnection, InetSocketAddress, URI}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}

import com.sun.net.httpserver.HttpServer
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** OpenSearch / Elasticsearch Bulk-API source and sink (reference
  * `/root/reference/libtenzir/builtins/operators/to_opensearch.cpp` and
  * `from_opensearch.cpp`).
  *
  * `toOpensearch` is the client half: each event becomes an action line
  * (`{"create":{"_index":"idx"}}`) followed by its document line, POSTed as
  * `application/x-ndjson` to `…/_bulk` (to_opensearch.cpp:66-69 appends the
  * `_bulk` segment when missing; :26-45 names the action/index/id/
  * max_content_length knobs). Requests go out from the *executors* — one
  * request per size-capped batch per partition, so a large result ships with
  * cluster parallelism, exactly like [[Http.saveHttp]].
  *
  * `fromOpensearch` is the server half, and mirrors the reference's unusual
  * direction: it *emulates* the Bulk API so Elastic-ecosystem shippers
  * (Filebeat, Logstash) can push into the pipeline
  * (from_opensearch.cpp:302-345 — an HTTP server that answers `/_bulk`,
  * skips the action metadata lines, and parses the document lines as
  * events). A listening endpoint is single-process by nature, so the server
  * runs on the driver like [[Net.loadUdp]]; rows distribute as soon as a
  * transformation runs.
  */
object Opensearch {

  /** POST `df`'s single string column (one JSON document per row) as bulk
    * actions. `action` ∈ create | index (the reference also maps update /
    * delete, which carry ids — pass `id = Some(col)` upstream by embedding
    * `_id` in the action via `idFrom`). Batches are capped by
    * `maxContentLength` bytes per request (to_opensearch.cpp's
    * `max_content_length`, default 5 MB there too).
    */
  def toOpensearch(df: DataFrame, url: String, index: String,
      action: String = "create", maxContentLength: Int = 5 * 1024 * 1024): Unit = {
    require(Set("create", "index").contains(action),
      s"toOpensearch: unsupported action '$action'")
    val bulkUrl = if (url.replaceAll("/+$", "").endsWith("/_bulk")) url
      else url.replaceAll("/+$", "") + "/_bulk"
    val actionLine = s"""{"$action":{"_index":"$index"}}"""
    df.foreachPartition { (rows: Iterator[Row]) =>
      // the cap is on the encoded request body, so count UTF-8 bytes, not chars
      val actionBytes = actionLine.getBytes(StandardCharsets.UTF_8)
      val buf = new java.io.ByteArrayOutputStream()
      def flush(): Unit = if (buf.size > 0) {
        val conn = URI.create(bulkUrl).toURL.openConnection().asInstanceOf[HttpURLConnection]
        try {
          conn.setRequestMethod("POST")
          conn.setDoOutput(true)
          conn.setRequestProperty("Content-Type", "application/x-ndjson")
          val out = new DataOutputStream(conn.getOutputStream)
          buf.writeTo(out)
          out.close()
          val code = conn.getResponseCode
          if (code >= 300) sys.error(s"toOpensearch: endpoint returned $code")
        } finally conn.disconnect()
        buf.reset()
      }
      rows.foreach { r =>
        val doc = r.getString(0).getBytes(StandardCharsets.UTF_8)
        if (buf.size > 0 && buf.size + actionBytes.length + doc.length + 2 > maxContentLength)
          flush()
        buf.write(actionBytes); buf.write('\n'); buf.write(doc); buf.write('\n')
      }
      flush()
    }
  }

  private val actionRe =
    """^\s*\{\s*"(create|index|update|delete)"\s*:""".r

  /** Listen on `port` for Bulk-API POSTs; return the received document lines
    * (column `value: string`, raw JSON) once `maxDocs` arrived or `timeoutMs`
    * passed. Action metadata lines are skipped, every other line is an event
    * (the reference's parser does the same over the newline-split payload,
    * from_opensearch.cpp:317-345); any other endpoint gets the minimal
    * version handshake Filebeat probes with.
    */
  def fromOpensearch(spark: SparkSession, port: Int, maxDocs: Int,
      timeoutMs: Int = 5000, bind: String = "0.0.0.0"): DataFrame = {
    import spark.implicits._
    val docs = new ConcurrentLinkedQueue[String]()
    val enough = new CountDownLatch(1)
    val server = HttpServer.create(new InetSocketAddress(bind, port), 0)
    server.createContext("/", ex => {
      val resp: Array[Byte] =
        if (ex.getRequestMethod == "POST" && ex.getRequestURI.getPath.endsWith("/_bulk")) {
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          // positional action/doc alternation (from_opensearch.cpp:317-345):
          // a doc FOLLOWS its action line, so a document whose first key
          // happens to be "create"/"index"/… is never mistaken for metadata;
          // `delete` actions carry no doc line. CRLF-delimited payloads are
          // legal NDJSON — split tolerates both endings.
          var expectDoc = false
          body.split("\r?\n").filter(_.trim.nonEmpty).foreach { line =>
            if (expectDoc) { docs.add(line); expectDoc = false }
            else actionRe.findFirstMatchIn(line) match {
              case Some(m) => expectDoc = m.group(1) != "delete"
              case None    => docs.add(line) // bare-NDJSON shipper: every line is a doc
            }
          }
          if (docs.size >= maxDocs) enough.countDown()
          """{"errors":false,"items":[]}""".getBytes(StandardCharsets.UTF_8)
        } else {
          """{"version":{"number":"8.0.0"},"tagline":"graft bulk endpoint"}"""
            .getBytes(StandardCharsets.UTF_8)
        }
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    try enough.await(timeoutMs, TimeUnit.MILLISECONDS)
    finally server.stop(0)
    docs.toArray(Array.empty[String]).toSeq.toDF("value")
  }
}
