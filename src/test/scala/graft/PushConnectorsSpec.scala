package graft

import java.io.{BufferedReader, DataOutputStream, InputStreamReader, OutputStreamWriter}
import java.net.{HttpURLConnection, InetSocketAddress, ServerSocket, URI}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}

import com.sun.net.httpserver.HttpServer

import graft.sources.{Email, Opensearch}

/** saveEmail against a stub SMTP server; to/fromOpensearch against the Bulk
  * API (stub server for the sink; a shipper-style client for the source).
  */
class PushConnectorsSpec extends SparkSpec {
  import spark.implicits._

  test("saveEmail speaks SMTP and dot-stuffs the body") {
    val server = new ServerSocket(0)
    val commands = new ConcurrentLinkedQueue[String]()
    val body = new StringBuilder
    val done = new CountDownLatch(1)
    new Thread(() => {
      val s = server.accept()
      val in = new BufferedReader(
        new InputStreamReader(s.getInputStream, StandardCharsets.UTF_8))
      val out = new OutputStreamWriter(s.getOutputStream, StandardCharsets.UTF_8)
      def reply(r: String): Unit = { out.write(r + "\r\n"); out.flush() }
      reply("220 stub ready")
      var inData = false
      var line = in.readLine()
      while (line != null) {
        if (inData) {
          if (line == ".") { inData = false; reply("250 queued") }
          else body.append(line).append('\n')
        } else {
          commands.add(line)
          line.split(' ').head match {
            case "HELO" => reply("250 stub")
            case "MAIL" => reply("250 ok")
            case "RCPT" => reply("250 ok")
            case "DATA" => inData = true; reply("354 go")
            case "QUIT" => reply("221 bye"); s.close(); done.countDown()
            case _      => reply("500 ?")
          }
        }
        line = if (s.isClosed) null else in.readLine()
      }
    }).start()

    Email.saveEmail(
      Seq("alpha", ".starts-with-dot", "omega").toDF("value"),
      endpoint = s"smtp://127.0.0.1:${server.getLocalPort}",
      to = "ops@example.com", from = "graft@example.com", subject = "digest")
    done.await()
    server.close()

    val cmds = commands.toArray(Array.empty[String]).toSeq
    assert(cmds.exists(_.startsWith("MAIL FROM:<graft@example.com>")))
    assert(cmds.exists(_.startsWith("RCPT TO:<ops@example.com>")))
    val text = body.toString
    assert(text.contains("Subject: digest"))
    assert(text.contains("alpha\n"))
    assert(text.contains("..starts-with-dot")) // dot-stuffed on the wire
    assert(text.contains("omega\n"))
  }

  test("toOpensearch posts size-capped bulk batches with action framing") {
    val requests = new ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", ex => {
      assert(ex.getRequestURI.getPath == "/_bulk")
      requests.add(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      val resp = """{"errors":false}""".getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    try {
      val docs = (1 to 6).map(i => s"""{"n":$i}""")
      Opensearch.toOpensearch(
        docs.toDF("value").repartition(2),
        url = s"http://127.0.0.1:${server.getAddress.getPort}", // no /_bulk: appended
        index = "logs", action = "create",
        maxContentLength = 80) // forces multiple batches
      val bodies = requests.toArray(Array.empty[String]).toSeq
      assert(bodies.size > 2) // the byte cap split partitions into batches
      val lines = bodies.flatMap(_.split('\n').filter(_.nonEmpty))
      val (actions, payload) = lines.partition(_.startsWith("""{"create""""))
      assert(actions.forall(_ == """{"create":{"_index":"logs"}}"""))
      assert(actions.size == payload.size) // strict alternation
      assert(payload.sorted == docs.sorted)
    } finally server.stop(0)
  }

  test("fromOpensearch accepts shipper bulk pushes and skips action lines") {
    val port = {
      val probe = new ServerSocket(0); val p = probe.getLocalPort; probe.close(); p
    }
    new Thread(() => {
      // a Filebeat-style shipper: probe GET /, then POST two bulk payloads
      Thread.sleep(300) // let the listener bind
      def req(method: String, path: String, ndjson: String): Unit = {
        val conn = URI.create(s"http://127.0.0.1:$port$path").toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        conn.setRequestMethod(method)
        if (method == "POST") {
          conn.setDoOutput(true)
          conn.setRequestProperty("Content-Type", "application/x-ndjson")
          val out = new DataOutputStream(conn.getOutputStream)
          out.write(ndjson.getBytes(StandardCharsets.UTF_8)); out.close()
        }
        assert(conn.getResponseCode == 200)
        conn.disconnect()
      }
      req("GET", "/", "")
      req("POST", "/_bulk",
        """{"create":{"_index":"logs"}}
          |{"msg":"one"}
          |{"index":{"_index":"logs","_id":"7"}}
          |{"msg":"two"}
          |""".stripMargin)
      req("POST", "/_bulk",
        """{"delete":{"_index":"logs","_id":"9"}}
          |{"create":{"_index":"logs"}}
          |{"msg":"three"}
          |""".stripMargin)
    }).start()

    val df = Opensearch.fromOpensearch(spark, port, maxDocs = 3, timeoutMs = 15000)
    val got = df.as[String].collect().toSet
    assert(got == Set("""{"msg":"one"}""", """{"msg":"two"}""", """{"msg":"three"}"""))
  }
}
