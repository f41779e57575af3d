package graft

import java.net.{HttpURLConnection, URI}

import graft.ops.Serve

class ServeSpec extends SparkSpec {
  import spark.implicits._

  private def get(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(stream.readAllBytes(), "UTF-8")
    conn.disconnect()
    (code, body)
  }

  test("serve pages a result set over HTTP with continuation tokens") {
    val df = (0 until 25).map(i => (i.toLong, s"row$i")).toDF("id", "v")
    val srv = Serve.start(df.orderBy("id"), port = 0, pageSize = 10)
    try {
      val base = s"http://127.0.0.1:${srv.port}"
      val (c0, b0) = get(s"$base/?token=0")
      assert(c0 == 200 && b0.contains(""""next":1""") &&
        b0.contains(""""id":0""") && b0.contains(""""id":9"""))
      // out-of-order token is rejected with the expected-token hint
      val (c409, b409) = get(s"$base/?token=5")
      assert(c409 == 409 && b409.contains("expected token 1"))
      val (c1, b1) = get(s"$base/?token=1")
      assert(c1 == 200 && b1.contains(""""id":19"""))
      val (c2, b2) = get(s"$base/?token=2")
      assert(c2 == 200 && b2.contains(""""next":null""") && b2.contains(""""id":24"""))
      val rows = Seq(b0, b1, b2).flatMap("\"id\":(\\d+)".r.findAllMatchIn(_).map(_.group(1).toInt))
      assert(rows == (0 until 25).toList)
    } finally srv.stop()
  }
}
