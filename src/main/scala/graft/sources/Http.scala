package graft.sources

import java.io.DataOutputStream
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** HTTP source/sink (reference
  * `/root/reference/libtenzir/builtins/operators/http.cpp`: `from_http` /
  * `http` fetch a URL or POST events to one).
  *
  * `loadHttp` is a driver-side GET (one URL = one request, like the
  * reference); `saveHttp` POSTs from the *executors* — one request per
  * partition batch via `foreachPartition`, so a large result ships to the
  * endpoint with cluster parallelism instead of squeezing through the
  * driver. Payloads are newline-delimited lines of a single string column
  * (the NDJSON convention the reference uses for its HTTP examples).
  */
object Http {

  /** GET `url`, one row per response line (column `value`). */
  def loadHttp(spark: SparkSession, url: String): DataFrame = {
    import spark.implicits._
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      val body = new String(conn.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      body.split('\n').filter(_.nonEmpty).toSeq.toDF("value")
    } finally conn.disconnect()
  }

  /** POST each partition's lines to `url` as one newline-joined request body
    * (executor-side: requests fan out with the partitioning; `batchRows`
    * caps a single request's row count).
    */
  def saveHttp(df: DataFrame, url: String, batchRows: Int = 4096): Unit = {
    df.foreachPartition { (rows: Iterator[Row]) =>
      rows.map(_.getString(0)).grouped(batchRows).foreach { group =>
        val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
        try {
          conn.setRequestMethod("POST")
          conn.setDoOutput(true)
          conn.setRequestProperty("Content-Type", "application/x-ndjson")
          val out = new DataOutputStream(conn.getOutputStream)
          out.write(group.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
          out.close()
          val code = conn.getResponseCode
          if (code >= 300) sys.error(s"saveHttp: endpoint returned $code")
        } finally conn.disconnect()
      }
    }
  }
}
