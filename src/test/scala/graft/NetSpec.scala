package graft

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.{InetSocketAddress, ServerSocket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}

import com.sun.net.httpserver.HttpServer
import org.apache.spark.sql.functions._

import graft.sources.{Http, Net}

class NetSpec extends SparkSpec {
  import spark.implicits._

  test("saveTcp then loadTcp roundtrip over loopback") {
    val server = new ServerSocket(0)
    val received = new ConcurrentLinkedQueue[String]()
    val done = new CountDownLatch(1)
    val t = new Thread(() => {
      val s = server.accept()
      val in = new BufferedReader(
        new InputStreamReader(s.getInputStream, StandardCharsets.UTF_8))
      Iterator.continually(in.readLine()).takeWhile(_ != null).foreach(received.add)
      s.close(); done.countDown()
    })
    t.start()
    Net.saveTcp(Seq("a", "b", "c").toDF("value"), "127.0.0.1", server.getLocalPort)
    done.await()
    server.close()
    assert(received.toArray.toSeq == Seq("a", "b", "c"))

    // loadTcp: a server that writes three lines then closes
    val src = new ServerSocket(0)
    val t2 = new Thread(() => {
      val s = src.accept()
      val out = new OutputStreamWriter(s.getOutputStream, StandardCharsets.UTF_8)
      out.write("x\ny\nz\n"); out.flush(); s.close()
    })
    t2.start()
    val df = Net.loadTcp(spark, "127.0.0.1", src.getLocalPort)
    src.close()
    assert(df.as[String].collect().toSeq == Seq("x", "y", "z"))
  }

  test("saveUdp datagrams arrive at loadUdp") {
    val port = {
      val probe = new java.net.DatagramSocket(); val p = probe.getLocalPort; probe.close(); p
    }
    val sender = new Thread(() => {
      Thread.sleep(300) // let the receiver bind first
      Net.saveUdp(Seq("p1", "p2", "p3").toDF("value"), "127.0.0.1", port)
    })
    sender.start()
    val df = Net.loadUdp(spark, port, maxPackets = 3, timeoutMs = 5000)
    sender.join()
    assert(df.as[String].collect().toSet == Set("p1", "p2", "p3"))
  }

  test("saveHttp posts partition batches; loadHttp reads them back") {
    val received = new ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", ex => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      if (ex.getRequestMethod == "POST") body.split('\n').filter(_.nonEmpty).foreach(received.add)
      val resp =
        if (ex.getRequestMethod == "GET") "g1\ng2\n".getBytes(StandardCharsets.UTF_8)
        else "ok".getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/"
      Http.saveHttp((1 to 10).map(i => s"e$i").toDF("value").repartition(3), url, batchRows = 2)
      assert(received.toArray(Array.empty[String]).toSeq.sorted ==
        (1 to 10).map(i => s"e$i").sorted)
      val df = Http.loadHttp(spark, url)
      assert(df.select(col("value")).as[String].collect().toSeq == Seq("g1", "g2"))
    } finally server.stop(0)
  }
}
