package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `files` source + `file_contents` function.
  *
  * Reference analogues: the `files` directory-walk source
  * (`/root/reference/libtenzir/builtins/operators/files.cpp:87-148`, emitting
  * path/type/size/mtime per entry) and the `file_contents` scalar
  * (`builtins/functions/file_contents.cpp`).
  *
  * Spark-first shape: the listing rides Spark's own `binaryFile` reader so the
  * walk works against any Hadoop filesystem (local, HDFS, S3A) and the listing
  * itself distributes; `file_contents` over many paths is a distributed binary
  * read, not a driver loop.
  */
object Files {

  /** One row per file under `path`: path, type, size, mtime. `recurse`
    * descends into subdirectories (the reference's `recurse` flag).
    */
  def files(spark: SparkSession, path: String, recurse: Boolean = false,
      glob: String = "*"): DataFrame = {
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", recurse.toString)
      .load(path)
      .select(
        col("path"),
        lit("regular").as("type"),
        col("length").as("size"),
        col("modificationTime").as("mtime"))
  }

  /** `file_contents(path)`-style bulk read: join each input path with its
    * bytes (and optionally UTF-8 text). Distributed — each file is read by
    * the scan task that owns it, never the driver.
    */
  def fileContents(spark: SparkSession, path: String, recurse: Boolean = false): DataFrame =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", recurse.toString)
      .load(path)
      .select(col("path"), col("content"), col("content").cast("string").as("text"))

  /** Driver-side single-file convenience (the scalar function's exact shape:
    * one path → one blob).
    */
  def fileContentsOf(spark: SparkSession, file: String): Array[Byte] = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try org.apache.commons.io.IOUtils.toByteArray(in)
    finally in.close()
  }

  /** Path scalar functions (reference `functions/path/…`: file_name,
    * parent_dir, trim extension).
    */
  def fileName(path: Column): Column = element_at(split(path, "/"), -1)
  def parentDir(path: Column): Column =
    regexp_replace(path, "/[^/]*$", "")
}
