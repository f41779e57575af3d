package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** DSIR-style hashed n-gram importance scoring (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling"): score every
  * corpus document by how target-like its hashed n-gram profile is, relative
  * to the corpus background — the data-selection step between dedup and the
  * training mix. The reference's pipeline has no selection stage; this is a
  * webtext-axis extension alongside [[Dedup.decontaminate]].
  *
  * Determinism contract: the per-doc masses are INTEGER sums of smoothed
  * bucket counts (add-one), folded per row; the only floating-point step is
  * one exactly-rounded division, so a DuckDB oracle reproduces scores
  * bit-for-bit (no `ln`, whose last-ulp behavior differs across libm
  * implementations).
  *
  * Plan shape at 100 TB: two hashed-bucket count jobs (map-side combine
  * collapses each partition to ≤ `buckets` rows before the shuffle; the
  * driver collect is ≤ `buckets` rows — bounded, like the CDC stats
  * collects), then ONE scoring scan with the count tables embedded as
  * literal maps — zero shuffle, zero join on the big side.
  */
object Dsir {

  /** Per-bucket gram counts of a corpus — at most `buckets` rows. */
  def bucketCounts(df: DataFrame, textCol: String, n: Int, buckets: Int): DataFrame =
    df.select(explode(Text.windowsAll(col(textCol), n)).as("__g"))
      .select(pmod(Text.md5h60(col("__g")), lit(buckets.toLong)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))

  /** One row per document: `n_grams`, `t_mass` = Σ_g (target_count(bucket(g))
    * + 1), `b_mass` likewise vs the background (the corpus itself), and
    * `score = t_mass / b_mass` (null for gram-less docs). Resample downstream
    * with [[Pipe.PipeOps.sampleStratified_]]-style hash thresholds on the
    * score.
    */
  def score(docs: DataFrame, target: DataFrame, textCol: String, idCol: String,
      n: Int = 2, buckets: Int = 512): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    def countsMap(df: DataFrame): Map[Long, Long] =
      bucketCounts(df, textCol, n, buckets)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (tc, bc) = (countsMap(target), countsMap(docs))
    def massOf(counts: Map[Long, Long], bk: Column): Column =
      (if (counts.isEmpty) lit(0L) else coalesce(element_at(typedlit(counts), bk), lit(0L))) + lit(1L)
    val grams = Text.windowsAll(col(textCol), n)
    val folded = aggregate(grams, struct(lit(0L).as("t"), lit(0L).as("b")),
      (acc, g) => {
        val bk = pmod(Text.md5h60(g), lit(buckets.toLong))
        struct((acc("t") + massOf(tc, bk)).as("t"), (acc("b") + massOf(bc, bk)).as("b"))
      })
    docs
      .select(col(idCol), size(grams).cast("long").as("n_grams"), folded.as("__m"))
      .select(col(idCol), col("n_grams"),
        col("__m.t").as("t_mass"), col("__m.b").as("b_mass"),
        when(col("n_grams") > 0,
          col("__m.t").cast("double") / col("__m.b").cast("double")).as("score"))
  }
}
