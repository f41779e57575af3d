package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Two paths:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline. The
  *    query side is broadcast (queries ≪ corpus), so the corpus is scanned
  *    once with no shuffle of the big side; top-k is a per-query window.
  *  - [[lshTopK]]: random-hyperplane LSH bucketing — the scale path. Probes
  *    only buckets sharing a signature band with the query, trading recall
  *    for a candidate set ~buckets·occupancy instead of the full corpus.
  *
  * An IVF variant (k-means coarse quantizer) would slot into the same shape —
  * assign each vector a centroid id, probe nearest centroids; hyperplane LSH
  * needs no training pass, which keeps the pipeline single-scan.
  */
object Similarity {

  /** Deterministic pseudo-random unit-ish hyperplane component: hash of
    * (seed, plane, dim) mapped to [-1, 1). No stored model — any executor can
    * recompute plane p, dimension d identically.
    */
  private def planeComponent(plane: Int, dim: Column, seed: Long): Column =
    (pmod(xxhash64(lit(seed), lit(plane), dim), lit(1000000L)).cast("double") / 500000.0) - 1.0

  /** Sign-bit signature over `planes` random hyperplanes, packed into a long.
    * Pure Column logic: dot(v, plane_p) = fold over element index.
    */
  def hyperplaneSig(vec: Column, planes: Int, seed: Long): Column = {
    val idx = sequence(lit(0), size(vec) - 1)
    val bits = (0 until planes).map { p =>
      val d = aggregate(idx, lit(0.0),
        (acc, i) => acc + element_at(vec, i + 1).cast("double") * planeComponent(p, i, seed))
      when(d > 0.0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  /** Exact cosine top-k: for each row of `queries`, the k nearest `corpus`
    * rows by cosine similarity (ties broken by corpus id — deterministic).
    * Output: (query_id, corpus_id, cosine, rank).
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", Text.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** LSH-bucketed approximate top-k: candidates = corpus rows sharing at
    * least one signature band with the query; exact cosine re-rank within
    * candidates. Recall grows with `bands` (multi-probe); cost is bucket
    * occupancy, not corpus size.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int,
      planes: Int = 16, bands: Int = 4, seed: Long = 42L): DataFrame = {
    val perBand = planes / bands
    def banded(df: DataFrame, id: String, v: String): DataFrame = {
      val sig = hyperplaneSig(col(vecCol), planes, seed)
      df.select(col(idCol).as(id), col(vecCol).as(v), sig.as("sig"))
        .select(col(id), col(v),
          posexplode(array((0 until bands).map(bd =>
            shiftrightunsigned(col("sig"), bd * perBand).bitwiseAND((1L << perBand) - 1L)): _*))
            .as(Seq("band", "bucket")))
    }
    val cb = banded(corpus, "corpus_id", "cv")
    val qb = banded(queries, "query_id", "qv")
    val candidates = cb.join(qb, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .dropDuplicates("query_id", "corpus_id")
      .withColumn("cosine", Text.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    candidates.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }
}
