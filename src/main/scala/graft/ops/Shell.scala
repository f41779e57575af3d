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
    *
    * Any child exit status outside `okExit` FAILS the task (with the stderr
    * tail) instead of reporting the truncated partition as success. The
    * default tolerates 1 alongside 0 — the near-universal filter convention
    * (`grep` with no matching lines) — while still catching real crashes
    * (signal deaths, `grep` exit 2, interpreter exceptions).
    */
  def shell_(df: DataFrame, textCol: String, command: Seq[String],
      okExit: Set[Int] = Set(0, 1)): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cmd = command // avoid capturing the outer object in the task closure
    val ok = okExit
    df.select(textCol).as[String].mapPartitions { lines =>
      if (!lines.hasNext) Iterator.empty
      else {
        // stderr → a temp FILE, not a pipe (a chatty child otherwise fills
        // the ~64 KB pipe buffer, blocks on write(2), stops draining stdin,
        // and the task deadlocks) and not /dev/null (a crashing child's
        // diagnostics must survive to the failure message — silently
        // truncating the partition on a child error is data loss)
        val errFile = java.io.File.createTempFile("graft-shell-err", ".log")
        errFile.deleteOnExit()
        val proc = new ProcessBuilder(cmd: _*)
          .redirectError(errFile)
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
          private var finished = false
          // on stream end: reap the child and FAIL the task on non-zero exit
          // (with the stderr tail) instead of reporting a truncated partition
          // as success
          private def finish(): Unit = if (!finished) {
            finished = true
            writer.join(); val rc = proc.waitFor(); stdout.close()
            val err =
              try {
                val bytes = java.nio.file.Files.readAllBytes(errFile.toPath)
                new String(bytes.takeRight(2048), StandardCharsets.UTF_8)
              } finally errFile.delete()
            if (!ok(rc)) throw new RuntimeException(
              s"shell command '${cmd.mkString(" ").take(120)}' exited $rc" +
                (if (err.nonEmpty) s"; stderr tail:\n$err" else ""))
          }
          def hasNext: Boolean = {
            if (nextLine == null) finish()
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
