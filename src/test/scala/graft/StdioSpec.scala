package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, PrintStream}

import org.apache.spark.sql.functions._

import graft.sources.Stdio

class StdioSpec extends SparkSpec {
  import spark.implicits._

  test("loadStdin reads lines; saveStdout writes lines") {
    val in = new ByteArrayInputStream("alpha\nbravo\ncharlie\n".getBytes("UTF-8"))
    val old = System.in
    val df =
      try { System.setIn(in); Stdio.loadStdin(spark) }
      finally System.setIn(old)
    assert(df.as[String].collect().toSeq == Seq("alpha", "bravo", "charlie"))

    val buf = new ByteArrayOutputStream()
    Console.withOut(new PrintStream(buf, true, "UTF-8")) {
      Stdio.saveStdout(df.select(upper(col("value"))))
    }
    assert(buf.toString("UTF-8") == "ALPHA\nBRAVO\nCHARLIE\n")
  }
}
