package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** stdin/stdout endpoints (reference
  * `/root/reference/libtenzir/builtins/loaders/stdin.cpp` /
  * `savers/stdout.cpp` — `load_stdin` reads the process's stdin as a byte
  * stream, `save_stdout` writes one).
  *
  * These are inherently single-process endpoints in the reference too — a
  * pipe has exactly one stdin — so the driver-side read/write here is the
  * honest mapping, not a scale compromise: the data fans out to executors the
  * moment a transformation runs (and `saveStdout` streams partition-at-a-time
  * via `toLocalIterator`, never materializing the full result).
  */
object Stdio {

  /** `load_stdin` → one row per line, column `value` (the same shape as
    * `spark.read.text`).
    */
  def loadStdin(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val reader = new BufferedReader(
      new InputStreamReader(System.in, StandardCharsets.UTF_8))
    Iterator.continually(reader.readLine()).takeWhile(_ != null)
      .toSeq.toDF("value")
  }

  /** `save_stdout` — write a single string column as lines. */
  def saveStdout(df: DataFrame): Unit = {
    val it = df.toLocalIterator()
    while (it.hasNext) Console.out.println(it.next().getString(0))
    Console.out.flush()
  }
}
