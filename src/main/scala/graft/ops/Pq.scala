package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011) over an embedding column — the
  * memory-compression half of ANN at 100 TB: a d-dim vector becomes `m`
  * small codes (one per subspace), shrinking the resident index by ~d·4/m
  * bytes per vector while distances stay approximable from tiny per-query
  * lookup tables. Complements [[Similarity.ivfTopK]] (IVF-PQ is the
  * canonical pairing).
  *
  * Everything rides [[Similarity.kmeans]]'s deterministic integer geometry:
  * coordinates quantized to positive longs, integer squared-L2, min-struct
  * tiebreaks — so codebooks, codes, and reconstruction errors are
  * bit-identical across engines/partitionings and the DuckDB oracle can
  * replay the whole fit+encode relationally.
  *
  * Plan shape at scale: `fit` runs m small kmeans jobs (centroids are
  * driver-side k×subdim longs — bounded); `encode` is ONE zero-join,
  * zero-shuffle scan with the codebooks embedded as literals; `adcTopK`
  * broadcasts per-query distance TABLES (m·k longs per query), so the
  * encoded corpus is scanned once and never shuffled on the query axis.
  */
object Pq {

  import Similarity.{quantizeVec => quantize, sqDistToLit => sqDist}

  /** Fit per-subspace codebooks: split `vecCol` (dim divisible by `m`) into
    * m contiguous subspaces and run the deterministic integer kmeans in
    * each. Returns m × k × (dim/m) quantized centroids.
    *
    * The projected input is persisted once: kmeans issues one seed collect
    * plus one centroid-update job per round PER SUBSPACE — uncached that is
    * m·(iterations+1) full rescans of the source (parquet at 100 TB).
    */
  def fit(df: DataFrame, vecCol: String, idCol: String, m: Int, k: Int,
      iterations: Int = 2): Array[Array[Array[Long]]] = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v")).persist()
    try {
      val dim = base.select(size(col("v"))).head().getInt(0)
      require(dim % m == 0, s"dim $dim not divisible by m=$m")
      val sub = dim / m
      (0 until m).map { s =>
        val sliced = base.select(col("id"),
          slice(col("v"), s * sub + 1, sub).as("v"))
        Similarity.kmeans(sliced, "v", "id", k, iterations)._2
      }.toArray
    } finally base.unpersist()
  }

  /** Encode every vector: per subspace the argmin-distance code (tie →
    * smaller code, same as kmeans assignment) plus the total integer
    * reconstruction error. One scan, codebooks as literals.
    * Output: (idCol, code0..code{m-1} (long), recon_err (long)).
    */
  def encode(df: DataFrame, vecCol: String, idCol: String,
      codebooks: Array[Array[Array[Long]]]): DataFrame = {
    val sub = codebooks(0)(0).length
    val qv = quantize(col(vecCol))
    val best = codebooks.zipWithIndex.map { case (cents, s) =>
      val sv = slice(qv, s * sub + 1, sub)
      array_min(array(cents.zipWithIndex.map { case (c, i) =>
        struct(sqDist(sv, c).as("d"), lit(i.toLong).as("c"))
      }.toIndexedSeq: _*))
    }
    df.select(
      col(idCol) +:
        best.zipWithIndex.map { case (b, s) => b.getField("c").as(s"code$s") }.toIndexedSeq :+
        best.map(_.getField("d")).reduce(_ + _).as("recon_err"): _*)
  }

  /** Asymmetric-distance top-k: exact integer squared-L2 from each QUERY
    * vector to each corpus row's RECONSTRUCTION (sum over subspaces of the
    * query-slice → codeword distance). The per-query distance table (m·k
    * longs) is built inline from the literal codebooks; the encoded corpus
    * is scanned once, queries broadcast. Deterministic: distance asc, then
    * corpus id.
    */
  def adcTopK(encoded: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, codebooks: Array[Array[Array[Long]]], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val qv = quantize(col(vecCol))
    val q = queries.select(col(idCol).as("query_id"), qv.as("qq"))
    val dist = (0 until m).map { s =>
      val sv = slice(col("qq"), s * sub + 1, sub)
      // element_at over a literal array of per-code distances
      element_at(
        array(codebooks(s).map(c => sqDist(sv, c)).toIndexedSeq: _*),
        (col(s"code$s") + 1).cast("int"))
    }.reduce(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("corpus_id"))
    encoded.withColumnRenamed(idCol, "corpus_id")
      .crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("adist", dist)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "adist", "rank")
  }
}
