package graft.sources

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame

/** SMTP sink (reference `/root/reference/libtenzir/builtins/connectors/email.cpp`:
  * `save_email endpoint=…, to=…, from=…, subject=…` — the rendered events
  * become the message body of one email).
  *
  * The reference delegates the wire protocol to libcurl's SMTP transport;
  * here we speak the SMTP dialogue directly (HELO → MAIL FROM → RCPT TO →
  * DATA → QUIT) over a plain socket. Like stdin/stdout and the TCP savers,
  * an SMTP submission is a single-endpoint, driver-side operation — the
  * DataFrame streams through `toLocalIterator` partition-at-a-time, so the
  * body is never materialized wholesale on the driver.
  *
  * Endpoint accepts the reference's forms: `host:port`, `smtp://host:port`,
  * or `email://host:port` (email.cpp:216-224 normalizes the same way; we do
  * not do TLS — the sandbox has no certs and the reference's `smtps` path is
  * libcurl's, not the connector's).
  */
object Email {

  private def parseEndpoint(endpoint: String): (String, Int) = {
    val stripped = endpoint.replaceFirst("^(smtps?|email)://", "")
    stripped.split(':') match {
      case Array(h, p) => (h, p.toInt)
      case Array(h)    => (h, 25)
      case _           => sys.error(s"saveEmail: bad endpoint '$endpoint'")
    }
  }

  /** Send `df`'s single string column as the body of one email.
    *
    * Dot-stuffing per RFC 5321 §4.5.2: a body line starting with '.' is
    * escaped to '..' so the message terminator cannot be spoofed by data.
    */
  def saveEmail(df: DataFrame, endpoint: String, to: String, from: String,
      subject: String = ""): Unit = {
    // CR/LF in envelope or header values would inject SMTP commands/headers
    require(!Seq(to, from, subject).exists(_.exists(c => c == '\r' || c == '\n')),
      "saveEmail: to/from/subject must not contain CR or LF")
    val (host, port) = parseEndpoint(endpoint)
    val sock = new Socket(host, port)
    try {
      val in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      val out = new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8)

      def expect(codes: Set[Int]): Unit = {
        // multi-line replies: "250-..." continues, "250 ..." ends
        var line = in.readLine()
        while (line != null && line.length >= 4 && line.charAt(3) == '-') line = in.readLine()
        val code = Option(line).filter(_.length >= 3).map(_.take(3).toInt)
          .getOrElse(sys.error("saveEmail: connection closed mid-dialogue"))
        if (!codes(code)) sys.error(s"saveEmail: unexpected SMTP reply '$line'")
      }
      def send(cmd: String, expectCodes: Set[Int]): Unit = {
        out.write(cmd); out.write("\r\n"); out.flush(); expect(expectCodes)
      }

      expect(Set(220))
      send("HELO localhost", Set(250))
      send(s"MAIL FROM:<$from>", Set(250))
      send(s"RCPT TO:<$to>", Set(250, 251))
      send("DATA", Set(354))
      out.write(s"From: $from\r\nTo: $to\r\nSubject: $subject\r\n\r\n")
      val it = df.toLocalIterator()
      while (it.hasNext) {
        // a value may itself contain line breaks: every WIRE line must be
        // dot-stuffed, or an embedded "\r\n.\r\n" spoofs the terminator
        val value = Option(it.next().getString(0)).getOrElse("")
        for (line <- value.split("\r?\n", -1)) {
          if (line.startsWith(".")) out.write('.')
          out.write(line); out.write("\r\n")
        }
      }
      send(".", Set(250))
      send("QUIT", Set(221))
    } finally sock.close()
  }
}
