package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan evidence dump: `explain("formatted")` for every catalog
  * query, plus a grep summary of the scale-critical plan properties
  * (Parquet filter pushdown, column pruning, broadcast vs shuffle joins,
  * whole-stage codegen spans). Output: one `.txt` per query + `summary.tsv`.
  *
  * Usage: Explain <sfDir> <outDir> [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      // static plan (AQE off) so codegen/join annotations are visible; real
      // runs keep AQE on — this main only renders evidence
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val rows = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .flatMap { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
          Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
          val pushed = "PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined
          val codegen = "codegen id : (\\d+)".r.findAllMatchIn(plan)
            .map(_.group(1)).toSet.size
          val bhj = "\\(\\d+\\) BroadcastHashJoin".r.findAllIn(plan).size
          val smj = "\\(\\d+\\) SortMergeJoin".r.findAllIn(plan).size
          val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(plan).size
          val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(plan).size
          Some(s"$name\tpushedFilters=$pushed\tscans=$scans\texchanges=$exchanges" +
            s"\tbroadcastJoins=$bhj\tsortMergeJoins=$smj\tcodegenSpans=$codegen")
        } catch { case e: Throwable =>
          System.err.println(s"[explain] $name failed: ${e.getMessage}"); None
        }
      }
    Files.writeString(Paths.get(s"$outDir/summary.tsv"), rows.mkString("", "\n", "\n"))
    rows.foreach(println)
    spark.stop()
  }
}
