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

  test("fromOpensearch pairs docs positionally: action-named first keys survive, CRLF ok") {
    val port = {
      val probe = new ServerSocket(0); val p = probe.getLocalPort; probe.close(); p
    }
    new Thread(() => {
      Thread.sleep(300)
      val conn = URI.create(s"http://127.0.0.1:$port/_bulk").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      val out = new DataOutputStream(conn.getOutputStream)
      // CRLF-delimited; both docs start with a key named like a bulk action
      out.write(List(
        """{"create":{"_index":"logs"}}""", """{"index": 5, "msg": "x"}""",
        """{"index":{"_index":"logs"}}""", """{"delete": true, "msg": "y"}"""
      ).mkString("", "\r\n", "\r\n").getBytes(StandardCharsets.UTF_8))
      out.close()
      assert(conn.getResponseCode == 200)
      conn.disconnect()
    }).start()
    val got = Opensearch.fromOpensearch(spark, port, maxDocs = 2, timeoutMs = 15000)
      .as[String].collect().toSet
    assert(got == Set("""{"index": 5, "msg": "x"}""", """{"delete": true, "msg": "y"}"""))
  }

  test("toOpensearch counts the cap in UTF-8 bytes, not chars") {
    val requests = new ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", ex => {
      requests.add(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
      val resp = """{"errors":false}""".getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    try {
      // 2 docs × (28-byte action + 1 + 32-byte doc + 1) = 124 bytes > 100;
      // the same docs counted in CHARS are 2 × (28+1+16+1) = 92 ≤ 100 — so a
      // char-based cap would send ONE request, the byte-correct cap sends two
      val doc = s"""{"m":"${"世" * 8}"}""" // 16 chars, 32 UTF-8 bytes
      Opensearch.toOpensearch(
        Seq(doc, doc).toDF("value").coalesce(1),
        url = s"http://127.0.0.1:${server.getAddress.getPort}",
        index = "logs", action = "create", maxContentLength = 100)
      assert(requests.size == 2)
    } finally server.stop(0)
  }

  test("saveEmail dot-stuffs embedded CRLF lines and rejects CRLF in headers") {
    intercept[IllegalArgumentException](Email.saveEmail(
      Seq("x").toDF("value"), "smtp://127.0.0.1:1",
      to = "a@b", from = "c@d", subject = "a\r\nBcc: evil@x"))

    val server = new ServerSocket(0)
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
        } else line.split(' ').head match {
          case "HELO" => reply("250 stub")
          case "MAIL" => reply("250 ok")
          case "RCPT" => reply("250 ok")
          case "DATA" => inData = true; reply("354 go")
          case "QUIT" => reply("221 bye"); s.close(); done.countDown()
          case _      => reply("500 ?")
        }
        line = if (s.isClosed) null else in.readLine()
      }
    }).start()
    // the embedded "\r\n.\r\n" must NOT terminate DATA early — each wire
    // line is dot-stuffed, so the stub sees ".." and keeps reading
    Email.saveEmail(
      Seq("pre\r\n.\r\nQUIT injected?", "tail").toDF("value"),
      endpoint = s"smtp://127.0.0.1:${server.getLocalPort}",
      to = "a@b", from = "c@d", subject = "s")
    done.await()
    server.close()
    val text = body.toString
    assert(text.contains("pre\n"))
    assert(text.contains("..\n"))   // the spoofed terminator, stuffed
    assert(text.contains("QUIT injected?\n"))
    assert(text.contains("tail\n"))
  }
}
