package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.Text

/** Keyword relevance ranking over a document corpus — BM25, the standard
  * retrieval scorer behind quality-filter "looks like reference corpus"
  * selection and eval-set retrieval in training-data pipelines.
  *
  * Reference analogue: Tenzir has no ranking surface (its `sort`/`top` are
  * order-by); this is part of the web-scale extension set, same tier as the
  * dedup family.
  *
  * Oracle convention: the idf term uses Robertson's odds form
  * `(N - df + 0.5) / (df + 0.5)` WITHOUT the usual `ln` — ln is strictly
  * monotone, so every per-term ranking is identical to textbook BM25, and
  * the score stays inside IEEE `+ * /` arithmetic, which is exactly rounded
  * in both Spark and DuckDB (the repo-wide no-libm rule; [[Dsir]] avoids
  * `ln` for the same reason — libm ulp differences are not oracle-checkable).
  */
object Rank {

  /** BM25 scores for a fixed term list, top-k docs per term.
    *
    * Plan shape at 100 TB: one corpus scan computes all per-(doc, term)
    * term frequencies as codegen'd array folds (terms are literals — no
    * join, no shuffle); corpus statistics (N, Σdl, per-term df) are ONE
    * map-side-combinable aggregate collected to ≤ #terms + 1 driver rows and
    * re-embedded as literals (bounded, [[Dsir]]-style); scoring is then a
    * second zero-shuffle scan over the tf>0 posting rows. Top-k is a
    * two-phase window — rank within (term, salt) first, so the final
    * per-term sort sees at most `salts × k` rows instead of the whole
    * posting list (a single `Window.partitionBy(term)` would pin each
    * term's full posting list to ONE task — the textbook skew trap).
    *
    * @return (term, doc_id, tf, dl, score, rank), rank 1..topK per term,
    *         ties broken by doc_id — fully deterministic.
    */
  def bm25(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 10,
      salts: Int = 32): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val toks = Text.tokens(Text.normalize(col(textCol)))
    val tf: Column = explode(map_from_arrays(
      array(terms.map(lit): _*),
      array(terms.map(t =>
        coalesce(aggregate(toks, lit(0L),
          (acc, x) => acc + when(x === t, 1L).otherwise(0L)), lit(0L))): _*)))
    val posting = docs.select(
      col(idCol).cast("long").as("doc_id"),
      coalesce(size(toks), lit(0)).cast("long").as("dl"),
      tf.as(Seq("term", "tf")))

    // corpus stats: N and Σdl once per doc (tf rows repeat them #terms
    // times — divide back out), df per term; ≤ #terms rows collected.
    val stats = posting.groupBy(col("term")).agg(
      count(lit(1)).as("n"),
      sum(col("dl")).as("sumdl"),
      sum(when(col("tf") > 0, 1L).otherwise(0L)).as("df"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    if (stats.isEmpty) // empty corpus: no postings, nothing to rank
      return posting.withColumn("score", lit(0.0)).withColumn("rank", lit(0L))
        .select("term", "doc_id", "tf", "dl", "score", "rank").limit(0)
    val (n, sumdl) = (stats.head._2._1, stats.head._2._2)
    val dfMap = map(terms.flatMap(t => Seq(lit(t), lit(stats(t)._3))): _*)

    // avgdl and the score: a pinned tree of IEEE + * / over exact integers —
    // bit-identical in any engine with IEEE doubles.
    val avgdl = lit(sumdl.toDouble / n.toDouble) // n >= 1: empty corpus returned above
    val dfCol = element_at(dfMap, col("term")).cast("double")
    val idf = (lit(n.toDouble) - dfCol + lit(0.5)) / (dfCol + lit(0.5))
    val tfD = col("tf").cast("double")
    val core = (tfD * lit(k1 + 1.0)) /
      (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    val scored = posting.filter(col("tf") > 0).withColumn("score", idf * core)

    val ord = Seq(col("score").desc, col("doc_id").asc)
    val pre = Window.partitionBy(col("term"), pmod(col("doc_id"), lit(salts)))
      .orderBy(ord: _*)
    val fin = Window.partitionBy(col("term")).orderBy(ord: _*)
    scored
      .withColumn("prerank", row_number().over(pre)).filter(col("prerank") <= topK)
      .withColumn("rank", row_number().over(fin).cast("long")).filter(col("rank") <= topK)
      .select("term", "doc_id", "tf", "dl", "score", "rank")
  }

  /** Hashed n-gram language-model quality scoring — the CCNet-style "does
    * this document look like the reference corpus" perplexity filter
    * (Wenzek et al. 2020), re-expressed under the repo's no-libm determinism
    * rule: instead of Σ log p (libm `ln` is not oracle-checkable), the score
    * is the MEAN in-context token probability under an add-one-smoothed
    * hashed-bigram model. Each per-token probability is one exactly-rounded
    * IEEE division of integer counts, and the document sum is a left fold in
    * token order — bit-identical across engines, replays, and cluster sizes.
    * (Arithmetic instead of geometric mean changes the exact ordering but not
    * the filter's purpose: natural text scores high, gibberish and
    * boilerplate-mangled text score low.)
    *
    * Plan shape at 100 TB: two hashed-bucket count jobs over the reference
    * corpus (map-side combine collapses each partition to ≤ `buckets` rows
    * before the shuffle; the driver collect is ≤ `buckets` rows — bounded,
    * [[Dsir]]-style), then ONE scoring scan with both count tables embedded
    * as literal maps — zero shuffle, zero join on the corpus side.
    *
    * @param reference corpus to train the bigram counts on (defaults to
    *                  `docs` itself — self-scoring, the boilerplate-detection
    *                  mode); pass the high-quality target corpus for the
    *                  CCNet filter proper.
    * @return (id, n_grams, sum_prob, avg_prob) — `avg_prob` null for docs
    *         with fewer than 2 tokens.
    */
  def lmAvgProb(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      reference: Option[DataFrame] = None,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val ref = reference.getOrElse(docs)
    def countsOf(n: Int): Map[Long, Long] =
      ref.select(explode(Text.windowsAll(col(textCol), n)).as("__g"))
        .select(pmod(Text.md5h60(col("__g")), lit(buckets.toLong)).as("b"))
        .groupBy("b").agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (big, uni) = (countsOf(2), countsOf(1))
    def lookup(counts: Map[Long, Long], bk: Column): Column =
      if (counts.isEmpty) lit(0L)
      else coalesce(element_at(typedlit(counts), bk), lit(0L))
    def bucketOf(g: Column): Column = pmod(Text.md5h60(g), lit(buckets.toLong))

    val grams = Text.windowsAll(col(textCol), 2)
    val ctxs = Text.windowsAll(col(textCol), 1) // = the token list
    // context of bigram i = token i: zip grams with the token prefix
    val pairs = zip_with(grams, slice(ctxs, lit(1), size(grams)),
      (g, c) => struct(g.as("g"), c.as("c")))
    val folded = aggregate(pairs, lit(0.0), (acc, x) =>
      acc + (lookup(big, bucketOf(x("g"))) + lit(1L)).cast("double") /
        (lookup(uni, bucketOf(x("c"))) + lit(buckets.toLong)).cast("double"))
    docs
      .select(col(idCol), size(grams).cast("long").as("n_grams"), folded.as("sum_prob"))
      .withColumn("avg_prob",
        when(col("n_grams") > 0, col("sum_prob") / col("n_grams").cast("double")))
  }

  /** Integer-mass PageRank over a (src, dst) link graph — the host/page
    * authority score web-data curation pipelines use to pick crawl subsets
    * (Common Crawl publishes exactly this as its host-level ranking).
    *
    * Determinism: masses are scaled LONGS and every step is integer
    * multiply / truncating division / sum — integer sums are
    * order-independent, so the result is bit-identical under any
    * partitioning, replay, or cluster size (a float PageRank is not: float
    * sum order varies by partition). Each node starts with `initMass`;
    * per iteration a node keeps base = initMass·(1-d) and receives
    * `((mass · dampNum) div dampDen) div outdeg` from each in-neighbor —
    * truncation leaks a few units of mass per hop, irrelevant to ranking
    * and identically reproduced by any engine with integer division.
    * Dangling nodes (outdeg 0) simply contribute nothing (the standard
    * simplification).
    *
    * Plan shape at 100 TB: edges join outdeg ONCE (one shuffle, persisted);
    * per iteration ONE shuffle join (ranks into the edge list, both sides
    * hash-partitioned on the key) + ONE sum-aggregate with map-side partial
    * combine absorbing hot-page in-degree skew; eager localCheckpoint per
    * round keeps the self-referential plan constant-size ([[Cluster]]'s
    * lesson). Iterations are a fixed K — bounded cost, no convergence scan.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      iterations: Int = 5,
      dampNum: Long = 17L,
      dampDen: Long = 20L,
      initMass: Long = 1000000L): DataFrame = {
    require(iterations >= 1 && dampNum >= 0 && dampDen > dampNum && initMass > 0)
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val nodes = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val e2 = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val base = initMass - initMass * dampNum / dampDen

    var ranks = nodes.select(col("id"), lit(initMass).as("mass"))
    for (_ <- 1 to iterations) {
      val contribs = e2.join(ranks, e2("src") === ranks("id"))
        .select(e2("dst").as("id"),
          expr(s"((mass * $dampNum) div $dampDen) div outdeg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"), (lit(base) + coalesce(col("s"), lit(0L))).as("mass"))
        .localCheckpoint(true)
    }
    nodes.unpersist()
    e2.unpersist()
    ranks
  }

  /** HITS hubs & authorities (Kleinberg 1999) over a link graph — the
    * companion score pair to [[pageRank]]: authorities are pages good links
    * point AT, hubs are pages that point at good authorities (crawl seeding
    * and spam-domain triage both use the distinction).
    *
    * Determinism, same doctrine as [[pageRank]]: integer masses, integer
    * sums (order-independent), and instead of the textbook L2 normalization
    * (float, order-sensitive) each half-step rescales by the TRUNCATING
    * integer factor `max(mass) div initMass` (floored at 1) — a monotone
    * per-round rescale that bounds masses near `initMass · max-degree`
    * (no overflow at any graph scale) without changing the ranking, and
    * reproduces bit-for-bit in any engine with integer division. The scale
    * factor enters the plan as a broadcast 1-row aggregate, not a driver
    * collect.
    *
    * Plan shape: edges deduped + persisted once; per half-step ONE
    * hash-join of scores into the edge list + ONE map-side-combinable sum
    * (hot-page in-degree skew absorbed by partial aggregation); eager
    * localCheckpoint per round keeps the iterative plan constant-size.
    *
    * @return (id, hub, authority) — scaled longs.
    */
  def hits(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst",
      iterations: Int = 3,
      initMass: Long = 1000000L): DataFrame = {
    require(iterations >= 1 && initMass > 0)
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)

    // one half-step: sum the counterpart score over `joinKey` edges into
    // `groupKey` nodes, then rescale by max(mass) div initMass (min 1)
    def halfStep(scores: DataFrame, scoreCol: String,
        joinKey: String, groupKey: String): DataFrame = {
      val contrib = e.join(
          scores.select(col("id").as(joinKey), col(scoreCol).as("m")), joinKey)
        .groupBy(col(groupKey).as("id")).agg(sum(col("m")).as("s"))
      val raw = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"), coalesce(col("s"), lit(0L)).as("s"))
      val sc = raw.agg(greatest(
        expr(s"max(s) div $initMass"), lit(1L)).as("sc"))
      raw.crossJoin(broadcast(sc))
        .select(col("id"), expr("s div sc").as("m"))
    }

    var scores = nodes.select(col("id"),
      lit(initMass).as("hub"), lit(initMass).as("authority"))
    for (_ <- 1 to iterations) {
      // authorities from hubs (follow edges forward), hubs from NEW auths.
      // auth is referenced twice (hub's input + the round's result) —
      // checkpoint it so the half-step isn't recomputed per consumer
      val auth = halfStep(scores.select(col("id"), col("hub")), "hub", "src", "dst")
        .withColumnRenamed("m", "authority").localCheckpoint(true)
      val hub = halfStep(auth.select(col("id"), col("authority")), "authority",
        "dst", "src").withColumnRenamed("m", "hub")
      scores = nodes
        .join(hub, Seq("id"), "left").join(auth, Seq("id"), "left")
        .select(col("id"), coalesce(col("hub"), lit(0L)).as("hub"),
          coalesce(col("authority"), lit(0L)).as("authority"))
        .localCheckpoint(true)
    }
    nodes.unpersist()
    e.unpersist()
    scores
  }
}
