package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Scale-guard behavior of the dedup family: shingle document-frequency cap
  * and observable (non-silent) LSH bucket drops.
  */
class DedupScaleSpec extends SparkSpec {
  import spark.implicits._

  // 20 docs sharing one boilerplate sentence + unique content; 2 true dups
  private lazy val docs = ((0 until 20).map { i =>
    (i.toLong, s"all rights reserved footer text. unique body $i alpha beta gamma delta ${"x" * (i % 3)}")
  } :+ (100L, "all rights reserved footer text. unique body 7 alpha beta gamma delta ")).toDF("doc_id", "text")

  test("ngramJaccard maxDocFreq drops boilerplate-only pairs, keeps true dups") {
    val uncapped = Dedup.ngramJaccard(docs, "text", "doc_id", threshold = 0.1)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    // boilerplate shingles appear in every doc → every pair is a candidate
    assert(uncapped.size > 50)
    val capped = Dedup.ngramJaccard(docs, "text", "doc_id", threshold = 0.1,
      maxDocFreq = Some(10))
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    // with the shared sentence capped away, only genuinely-similar pairs stay
    assert(capped.contains((7L, 100L)), "true near-dup lost by the cap")
    assert(capped.size < uncapped.size)
  }

  test("candidate generation is a single shuffle: no joins in the pair plans") {
    // the signature pipeline must be evaluated once (groupBy+collect_list
    // pair explosion), never via a self-join that recomputes it — lock the
    // plan shape so a regression back to the 2x-eval join shape fails here
    val vecs = (0 until 8).map(i => (i.toLong, Array(1.0, i.toDouble, 0.5)))
      .toDF("doc_id", "emb")
    for ((name, df) <- Seq(
        "ngramJaccard" -> Dedup.ngramJaccard(docs, "text", "doc_id", threshold = 0.1),
        "minhashLsh" -> Dedup.minhashLsh(docs, "text", "doc_id", bands = 4, rows = 2, threshold = 0.0),
        "simhashDup" -> Dedup.simhashDup(docs, "text", "doc_id"),
        "embeddingDup" -> Dedup.embeddingDup(vecs, "emb", "doc_id", threshold = 0.0))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"$name plan regressed to a self-join:\n$plan")
      assert(!plan.contains("CartesianProduct"), name)
    }
  }

  test("minhashLsh bucket cap is observable via minhashLshDroppedBuckets") {
    // make every doc identical → one giant bucket per band
    val same = (0 until 30).map(i => (i.toLong, "exactly the same text in every document body")).toDF("doc_id", "text")
    val dropped = Dedup.minhashLshDroppedBuckets(same, "text", "doc_id",
      bands = 4, rows = 2, maxBucket = 10)
    assert(dropped.count() > 0, "oversize buckets must be reported")
    assert(dropped.agg(max(col("cnt"))).head().getLong(0) == 30L)
    // and the candidate join indeed excluded them
    val pairs = Dedup.minhashLsh(same, "text", "doc_id", bands = 4, rows = 2,
      threshold = 0.0, maxBucket = 10)
    assert(pairs.count() == 0L)
    // with a sane cap nothing is dropped and all pairs surface
    assert(Dedup.minhashLshDroppedBuckets(same, "text", "doc_id",
      bands = 4, rows = 2, maxBucket = 1000).count() == 0L)
  }
}
