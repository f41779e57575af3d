package graft.sources

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.{DatagramPacket, DatagramSocket, InetAddress, InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TCP / UDP connectors (reference
  * `/root/reference/libtenzir/builtins/connectors/tcp.cpp` — listen/connect
  * loader + connect saver — and `connectors/udp.cpp` — datagram loader/saver).
  *
  * Spark mapping: the *streaming* `load_tcp` is Structured Streaming's native
  * `socket` source (one line per row, the same shape as the reference's
  * NDJSON-over-TCP examples); the batch variants below connect/receive on the
  * driver — like stdin/stdout, a socket endpoint is single-process by nature
  * (the reference's loader is one socket too) and the data distributes the
  * moment a transformation runs. `saveTcp`/`saveUdp` stream
  * partition-at-a-time via `toLocalIterator`, never materializing the result.
  */
object Net {

  /** `load_tcp` (live tail): Structured Streaming socket source — column
    * `value: string`, one row per received line. Compose with watermarked
    * windows / `foreachBatch` like any stream.
    */
  def loadTcpStream(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** Batch `load_tcp --connect`: connect, read lines until the peer closes. */
  def loadTcp(spark: SparkSession, host: String, port: Int): DataFrame = {
    import spark.implicits._
    val sock = new Socket(host, port)
    try {
      val in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      Iterator.continually(in.readLine()).takeWhile(_ != null).toSeq.toDF("value")
    } finally sock.close()
  }

  /** `save_tcp`: connect and write a single string column as lines. */
  def saveTcp(df: DataFrame, host: String, port: Int): Unit = {
    val sock = new Socket(host, port)
    try {
      val out = new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8)
      val it = df.toLocalIterator()
      while (it.hasNext) { out.write(it.next().getString(0)); out.write('\n') }
      out.flush()
    } finally sock.close()
  }

  /** `load_udp`: bind and receive datagrams (one row per packet) until
    * `maxPackets` arrive or `timeoutMs` passes with no packet — the
    * reference's loader reads until the pipeline is cancelled; a batch API
    * needs an explicit stop condition.
    */
  def loadUdp(spark: SparkSession, port: Int, maxPackets: Int,
      timeoutMs: Int = 2000): DataFrame = {
    import spark.implicits._
    val sock = new DatagramSocket(new InetSocketAddress("127.0.0.1", port))
    try {
      sock.setSoTimeout(timeoutMs)
      val buf = new Array[Byte](65535)
      val rows = Iterator.continually {
        try {
          val p = new DatagramPacket(buf, buf.length)
          sock.receive(p)
          Some(new String(p.getData, p.getOffset, p.getLength, StandardCharsets.UTF_8))
        } catch { case _: java.net.SocketTimeoutException => None }
      }.takeWhile(_.isDefined).take(maxPackets).flatten.toSeq
      rows.toDF("value")
    } finally sock.close()
  }

  /** `save_udp`: one datagram per row of a single string column. */
  def saveUdp(df: DataFrame, host: String, port: Int): Unit = {
    val sock = new DatagramSocket()
    try {
      val addr = InetAddress.getByName(host)
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val bytes = it.next().getString(0).getBytes(StandardCharsets.UTF_8)
        sock.send(new DatagramPacket(bytes, bytes.length, addr, port))
      }
    } finally sock.close()
  }
}
