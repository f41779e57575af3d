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
  *  - [[lshTopK]]: random-hyperplane LSH bucketing — a scale path needing no
  *    training pass. Probes only buckets sharing a signature band with the
  *    query, trading recall for a candidate set ~buckets·occupancy instead
  *    of the full corpus.
  *  - [[ivfTopK]]: IVF coarse quantizer — the other scale path. Each corpus
  *    vector is assigned to its nearest centroid (inverted list); a query
  *    probes only the `nprobe` nearest lists. With `nprobe = nlist` it
  *    degenerates to exact brute force (every list probed).
  */
object Similarity {

  /** Embedding dimension of the fixture tables (TESTDATA.md). */
  val DefaultDim = 64

  /** Quantization scale for the sign test: multiplying a float by 2^20 is
    * exact in double arithmetic, so `round` yields a deterministic integer
    * in every engine — the whole sign computation is then integer-exact
    * (no float-summation-order hazards between Spark and the DuckDB oracle).
    */
  val QuantScale = 1L << 20

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic integer hyperplane matrix: `planes` rows of `dim`
    * components in [-500000, 500000], derived from `seed` with splitmix64.
    * Precomputed driver-side and embedded as literals — both in the Spark
    * plan (constant-folded; round 1 recomputed a hash per row×plane×dim and
    * it was the slowest expression in the catalog) and in the generated
    * DuckDB oracle SQL.
    */
  def planeMatrix(planes: Int, dim: Int, seed: Long): Array[Array[Long]] =
    Array.tabulate(planes, dim)((p, d) =>
      java.lang.Math.floorMod(mix(seed ^ (1009L * p + d)), 1000001L) - 500000L)

  /** Sign-bit signature over `planes` deterministic hyperplanes, packed into
    * a long. Integer-exact: vec is quantized per element (`round(x * 2^20)`,
    * exact — see [[QuantScale]]) and dotted with the integer plane row;
    * magnitudes stay ≤ 2^45·dim, far from overflow.
    */
  def hyperplaneSig(vec: Column, planes: Int, seed: Long, dim: Int = DefaultDim): Column = {
    val m = planeMatrix(planes, dim, seed)
    val bits = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(vec, typedlit(m(p).toSeq),
          (x, c) => round(x.cast("double") * QuantScale.toDouble).cast("long") * c),
        lit(0L), (a, b) => a + b)
      when(dot > 0L, shiftleft(lit(1L), p)).otherwise(lit(0L))
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

  /** IVF-bucketed approximate top-k: a coarse quantizer splits the corpus
    * into `nlist` inverted lists (each vector assigned to its nearest
    * centroid by cosine, ties to the smaller centroid id); each query probes
    * the `nprobe` nearest lists and exact-reranks only their members.
    *
    * `centroids` defaults to the `nlist` corpus rows with the smallest ids —
    * a training-free deterministic rule (reproducible in a SQL oracle); at
    * production scale pass a k-means-sample fit instead, the probe shape is
    * unchanged. Plan shape: centroids are always broadcast (they are small by
    * construction); assignment is one map-side-combinable `max_by` per corpus
    * row (shuffle volume = one row per corpus id, never corpus × nlist); the
    * probe set (queries × nprobe) is broadcast into the candidate join, so
    * the corpus side is scanned once and never shuffled on the query axis.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      centroids: Option[DataFrame] = None): DataFrame = {
    val cent = centroids.getOrElse(corpus.orderBy(col(idCol)).limit(nlist))
      .select(col(idCol).as("cent_id"), col(vecCol).as("centv"))
    // inverted-list assignment: argmax cosine, tie → smaller centroid id
    val assigned = corpus
      .select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
      .crossJoin(broadcast(cent))
      .withColumn("cs", Text.cosine(col("cv"), col("centv")))
      .groupBy(col("corpus_id"))
      .agg(
        max_by(col("cent_id"), struct(col("cs"), negate(col("cent_id")))).as("list_id"),
        first(col("cv")).as("cv")) // cv identical across the group
    // probe: the nprobe nearest lists per query
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("cs").desc, col("cent_id"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cent))
      .withColumn("cs", Text.cosine(col("qv"), col("centv")))
      .withColumn("pr", row_number().over(wp))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qv"), col("cent_id").as("list_id"))
    val candidates = assigned.join(broadcast(probes), Seq("list_id"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", Text.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    candidates.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cosine", "rank")
  }

  /** Quantization for [[kmeans]]: `round(x·1024 + 4096)` — the offset keeps
    * every quantized coordinate POSITIVE (embeddings are unit-scale), which
    * makes truncating and flooring integer division coincide, so Scala `/`,
    * Spark `div` and DuckDB `//` all compute the same centroid means.
    * Translation does not change L2 distances, so cluster geometry is
    * unaffected.
    */
  val KmeansScale = 1024L
  val KmeansOffset = 4096L

  /** Quantize a float-vector column into the deterministic integer domain
    * ([[KmeansScale]]/[[KmeansOffset]]) that [[kmeans]], [[graft.ops.Pq]],
    * and their DuckDB oracles all share — ONE definition, so the
    * bit-identical codebook/encode guarantee cannot drift between call
    * sites. */
  def quantizeVec(vec: Column): Column =
    transform(vec, x =>
      round(x.cast("double") * KmeansScale.toDouble + KmeansOffset.toDouble).cast("long"))

  /** Integer squared-L2 between a quantized vector column and a literal
    * point (centroid / codeword). */
  def sqDistToLit(v: Column, point: Array[Long]): Column =
    aggregate(zip_with(v, typedlit(point.toSeq), (x, y) => (x - y) * (x - y)),
      lit(0L), (a, b) => a + b)

  /** Deterministic Lloyd's k-means over an embedding column — the training
    * pass that fits [[ivfTopK]]'s `centroids` parameter (its doc promises a
    * k-means fit at production scale; this is it).
    *
    * Exactness: coordinates are positive quantized longs ([[KmeansScale]]),
    * distances are integer squared-L2 (order-independent sums), assignment
    * ties break to the smaller centroid id, and centroid updates are
    * truncating integer means — every engine reproduces the run bit-for-bit
    * regardless of partitioning. Empty clusters keep their previous
    * centroid. Init = the `k` smallest-id rows (deterministic, SQL-expressible).
    *
    * Plan shape at 100 TB: centroids live driver-side between rounds (k·dim
    * longs — bounded) and enter each scan as LITERALS, so assignment is a
    * zero-join, zero-shuffle scan; the update is one posexplode +
    * groupBy(cluster, dim) sum — map-side combinable, shuffling exactly
    * k·dim partial rows per partition, never the vectors themselves.
    *
    * @return (assignments DataFrame (id, cluster), centroids as k×dim longs)
    */
  def kmeans(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      iterations: Int = 3): (DataFrame, Array[Array[Long]]) = {
    require(k >= 1 && iterations >= 1)
    val pts = df.select(col(idCol).as("id"), quantizeVec(col(vecCol)).as("qv"))

    var cents: Array[Array[Long]] = pts.orderBy(col("id")).limit(k)
      .collect().map(_.getSeq[Long](1).toArray)
    def assigned = {
      val dists = cents.zipWithIndex.map { case (c, i) =>
        struct(sqDistToLit(col("qv"), c).as("d"), lit(i).as("c"))
      }
      pts.withColumn("cluster", array_min(array(dists: _*)).getField("c"))
    }
    for (_ <- 1 to iterations) {
      val sums = assigned
        .select(col("cluster"), posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      cents = cents.zipWithIndex.map { case (prev, ci) =>
        if (!sums.contains((ci, 0))) prev // empty cluster: keep centroid
        else prev.indices.map { d => val (s, n) = sums((ci, d)); s / n }.toArray
      }
    }
    (assigned.select(col("id"), col("cluster").cast("long").as("cluster")), cents)
  }
}
