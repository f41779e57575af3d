package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Hashed-bag-of-words linear quality classifier (the fastText-style
  * trainable filter LLM pipelines run after heuristic rules — GPT-3 / LLaMA
  * style "looks like the curated corpus" classification). The reference has
  * no trainable stage; this is a webtext-axis extension alongside
  * [[Dsir]] (importance ratios) and [[Rank.lmAvgProb]] (LM scoring).
  *
  * Training is a batch perceptron over hashed token buckets with INTEGER
  * weights — deterministic and partitioning-independent (every update is an
  * order-independent integer sum), so a DuckDB oracle replays the whole fit
  * bit-for-bit. No learning-rate floats, no shuffled SGD order.
  *
  * Plan shape at 100 TB: per round, ONE scan of the corpus (scoring uses the
  * current weights as a literal map — no join) feeding a `buckets`-bounded
  * groupBy whose map-side combine collapses each partition to ≤ `buckets`
  * rows; the driver collect is ≤ `buckets` rows per round. Scoring /
  * prediction after training is a pure zero-shuffle scan.
  */
object Classify {

  /** Hashed bucket id per token occurrence (non-distinct, document order). */
  def bucketIds(text: Column, buckets: Int): Column =
    transform(
      coalesce(Text.tokens(Text.normalize(text)), array().cast("array<string>")),
      t => pmod(Text.md5h60(t), lit(buckets.toLong)))

  /** Margin score Σ_tokens w[bucket(token)] under literal weights — a pure
    * codegen'd fold, zero shuffle.
    */
  def scoreCol(text: Column, weights: Map[Long, Long], buckets: Int): Column =
    aggregate(bucketIds(text, buckets), lit(0L), (acc, b) => acc + weightOf(weights, b))

  /** Predicted label in {-1, +1}; the zero margin maps to -1, matching the
    * training rule that counts `label * score <= 0` as misclassified.
    */
  def predictCol(text: Column, weights: Map[Long, Long], buckets: Int): Column =
    when(scoreCol(text, weights, buckets) > 0L, 1L).otherwise(-1L)

  private def weightOf(w: Map[Long, Long], bucket: Column): Column =
    if (w.isEmpty) lit(0L)
    else coalesce(element_at(typedlit(w), bucket), lit(0L))

  /** Batch-perceptron fit: starting from zero weights, each round adds
    * Σ_{misclassified d} label_d · count_d(bucket) to every bucket weight.
    * Labels must be ±1. Stops early when a round has no misclassified
    * documents (the gradient is empty). Returns the bucket→weight map
    * (absent buckets are 0).
    */
  def train(df: DataFrame, textCol: String, labelCol: String,
      buckets: Int = 64, rounds: Int = 3): Map[Long, Long] = {
    require(buckets > 0, "buckets must be positive")
    var w = Map.empty[Long, Long]
    val ids = bucketIds(col(textCol), buckets)
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      val grad = df
        .select(col(labelCol).cast("long").as("__y"), ids.as("__b"),
          scoreCol(col(textCol), w, buckets).as("__s"))
        .where(col("__y") * col("__s") <= 0L)
        .select(col("__y"), explode(col("__b")).as("bucket"))
        .groupBy("bucket").agg(sum(col("__y")).as("g"))
        .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      if (grad.isEmpty) converged = true
      else w = (w.keySet ++ grad.keySet).iterator
        .map(b => b -> (w.getOrElse(b, 0L) + grad.getOrElse(b, 0L)))
        .filter(_._2 != 0L).toMap
      r += 1
    }
    w
  }
}
