package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame

/** The `shell` escape hatch (reference
  * `/root/reference/libtenzir/builtins/operators/shell.cpp`: forks a command
  * and pipes the byte stream through its stdin/stdout). Spark mapping: one
  * subprocess per partition, line-oriented — the ONLY non-Catalyst operator
  * besides the multimodal codec, and like it justified: an external binary is
  * not expressible as an expression. Each partition's rows stream through the
  * child concurrently (writer thread feeds stdin while the task iterator
  * drains stdout), so constant memory regardless of partition size.
  */
object Shell {

  /** Pipe `textCol` line-wise through `command`; returns one row per output
    * line (the command may emit more or fewer lines than it consumes, exactly
    * like the reference's byte-level contract).
    */
  def shell_(df: DataFrame, textCol: String, command: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cmd = command // avoid capturing the outer object in the task closure
    df.select(textCol).as[String].mapPartitions { lines =>
      if (!lines.hasNext) Iterator.empty
      else {
        // stderr → /dev/null: a chatty child otherwise fills the ~64 KB pipe
        // buffer, blocks on write(2), stops draining stdin, and the task
        // deadlocks (stderr is diagnostics, not data — the row contract is
        // stdout lines only)
        val proc = new ProcessBuilder(cmd: _*)
          .redirectError(ProcessBuilder.Redirect.DISCARD)
          .start()
        val writer = new Thread(() => {
          val out = new java.io.PrintWriter(new java.io.OutputStreamWriter(
            proc.getOutputStream, StandardCharsets.UTF_8))
          try lines.foreach(out.println)
          finally out.close()
        })
        writer.setDaemon(true)
        writer.start()
        val stdout = new java.io.BufferedReader(new java.io.InputStreamReader(
          proc.getInputStream, StandardCharsets.UTF_8))
        new Iterator[String] {
          private var nextLine: String = stdout.readLine()
          def hasNext: Boolean = {
            if (nextLine == null) { writer.join(); proc.waitFor(); stdout.close() }
            nextLine != null
          }
          def next(): String = {
            val l = nextLine; nextLine = stdout.readLine(); l
          }
        }
      }
    }.toDF(textCol)
  }
}
