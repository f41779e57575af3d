package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale a testdata directory by an integer factor with consistent key
  * shifts — the sf1.0 proof tier's input (the driver ships sf ≤ 0.1; a 10×
  * jump is the cheapest way to surface latent super-linear behavior before
  * 100× does). Copy 0 is the original; copy i shifts every key family by
  * `i · (max+1)` so foreign keys stay consistent (`lineitem.l_orderkey`
  * follows `orders.o_orderkey`, etc.). `events.user_id` is deliberately NOT
  * shifted: each CDC url receives factor× more versions — the harder replay.
  * Document text is perturbed per copy (vowel/consonant rotation — length-
  * preserving, so `n_chars` stays valid) so copies are not near-dup cliques
  * that would blow the pair queries up quadratically; embeddings get a
  * direction-changing nonlinear perturbation for the same reason.
  *
  * Usage: `GenSf <srcDir> <dstDir> [factor]` (default 10).
  */
object GenSf {

  private def rot(s: String, k: Int): String = {
    val kk = ((k % s.length) + s.length) % s.length
    s.drop(kk) + s.take(kk)
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    // the text/embedding perturbation families (5 vowel rotations × 2
    // consonant states) are distinct only up to 10 copies — past that,
    // copies repeat byte-identically and the near-dup pair queries blow up
    // quadratically, the exact false artifact this generator exists to avoid
    require(factor <= 10, s"GenSf supports factor <= 10 (got $factor); add " +
      "perturbation families before scaling further")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("gen-sf")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
      // ONE file per table (the driver's layout): DuckDB's oracle views read
      // `<dir>/<t>.parquet` as a single file, not a Spark part directory
      def write(t: String, df: DataFrame): Unit = {
        val tmp = s"$dst/_tmp_$t"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file written for $t"))
        val target = new java.io.File(s"$dst/$t.parquet")
        if (target.exists()) target.delete()
        java.nio.file.Files.move(part.toPath, target.toPath)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
        println(s"[gensf] $t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
      }
      def shiftBase(df: DataFrame, key: String): Long =
        df.agg(max(col(key))).head().getLong(0) + 1

      // fixed dimensions: copied verbatim
      write("region", read("region"))
      write("nation", read("nation"))

      def scaled(t: String, copy: (DataFrame, Int) => DataFrame): Unit = {
        val base = read(t)
        write(t, (0 until factor).map(i => copy(base, i)).reduce(_.unionByName(_)))
      }

      val cust = shiftBase(read("customer"), "c_custkey")
      val supp = shiftBase(read("supplier"), "s_suppkey")
      val part = shiftBase(read("part"), "p_partkey")
      val ord = shiftBase(read("orders"), "o_orderkey")
      val ev = shiftBase(read("events"), "event_id")
      val doc = shiftBase(read("documents"), "doc_id")
      val vec = shiftBase(read("embeddings"), "vec_id")

      scaled("customer", (d, i) => d.withColumn("c_custkey", col("c_custkey") + i * cust))
      scaled("supplier", (d, i) => d.withColumn("s_suppkey", col("s_suppkey") + i * supp))
      scaled("part", (d, i) => d.withColumn("p_partkey", col("p_partkey") + i * part))
      scaled("orders", (d, i) => d
        .withColumn("o_orderkey", col("o_orderkey") + i * ord)
        .withColumn("o_custkey", col("o_custkey") + i * cust))
      scaled("lineitem", (d, i) => d
        .withColumn("l_orderkey", col("l_orderkey") + i * ord)
        .withColumn("l_partkey", col("l_partkey") + i * part)
        .withColumn("l_suppkey", col("l_suppkey") + i * supp))
      // user_id unshifted: factor× more change events PER url
      scaled("events", (d, i) => d.withColumn("event_id", col("event_id") + i * ev))
      scaled("documents", (d, i) => {
        val t1 = translate(col("text"), "aeiou", rot("aeiou", i % 5))
        val t2 = if (i < 5) t1 else translate(t1, "bcdfg", rot("bcdfg", 1))
        d.withColumn("doc_id", col("doc_id") + i * doc)
          .withColumn("text", if (i == 0) col("text") else t2)
      })
      scaled("embeddings", (d, i) => d
        .withColumn("vec_id", col("vec_id") + i * vec)
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else transform(col("embedding"),
            x => (x + lit(0.001f) * i + lit(0.01f) * i * x * x).cast("float"))))
      println(s"[gensf] done: $dst at ${factor}x $src")
    } finally spark.stop()
  }
}
