package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** BPE tokenizer training over a corpus — the byte-pair-encoding merge loop
  * (Sennrich et al. 2016) as a distributed word-frequency fold. Part of the
  * training-data extension surface (the reference has no tokenizer-training
  * operator); pairs with `Text.tokenCount`'s BPE-ish counting regex.
  *
  * Shape for scale: the corpus is scanned ONCE (token explode → word-count
  * shuffle); every merge iteration then runs over the DISTINCT-word table
  * only — millions of rows at 100 TB corpus scale, independent of corpus
  * size — with one small aggregation job per merge (pair-count shuffle +
  * a single argmax row to the driver, the `pageRank`-style bounded driver
  * loop). Segmentations live as a space-joined string column; a merge is a
  * literal one-pass left-to-right `replace(" l r " → " lr ")`, so the
  * identical algorithm runs in DuckDB for the oracle. One replace pass per
  * iteration is the DOCUMENTED semantics: on same-symbol runs it can defer
  * a merge to a later iteration (the pair stays countable), which keeps
  * both engines bit-identical — canonical greedy BPE differs between real
  * implementations on exactly these runs anyway.
  */
object Bpe {

  /** Train `numMerges` BPE merges over the whitespace-token vocabulary of
    * `docs(textCol)` (normalized via [[Text.normalize]], words split into
    * codepoint symbols). Returns one row per merge:
    * (rank, lhs, rhs, pair_count) — deterministic: count-desc, then
    * lexicographic pair tiebreak.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    // one corpus scan: word frequencies
    val words = docs
      .select(explode(Text.tokens(Text.normalize(col(textCol)))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
      // initial segmentation: codepoint symbols, space-joined, space-guarded
      .withColumn("seg",
        concat(lit(" "),
          concat_ws(" ", regexp_extract_all(col("word"), lit("."), lit(0))),
          lit(" ")))
      .persist()
    words.count() // materialize once; iterations reuse the cached vocab

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var cur = words
    try {
      var rank = 1
      var exhausted = false
      while (rank <= numMerges && !exhausted) {
        val sym = split(trim(col("seg")), " ")
        val pairs = zip_with(
          slice(sym, lit(1), size(sym) - 1),
          slice(sym, lit(2), size(sym) - 1),
          (a, b) => concat(a, lit(" "), b))
        val best = cur.select(explode(pairs).as("pair"), col("freq"))
          .groupBy("pair").agg(sum(col("freq")).as("c"))
          .orderBy(col("c").desc, col("pair"))
          .limit(1).collect()
        if (best.isEmpty) exhausted = true // pair supply dry: no job per leftover rank
        else {
          val pair = best(0).getString(0)
          val cnt = best(0).getLong(1)
          val Array(l, r) = pair.split(" ", 2)
          merges += ((rank, l, r, cnt))
          val next = cur.withColumn("seg",
            org.apache.spark.sql.functions.replace(
              col("seg"), lit(s" $pair "), lit(s" $l$r "))).persist()
          next.count()
          if (cur ne words) cur.unpersist()
          cur = next
        }
        rank += 1
      }
    } finally {
      if (cur ne words) cur.unpersist()
      words.unpersist()
    }
    merges.toSeq.toDF("rank", "lhs", "rhs", "pair_count")
      .select(col("rank").cast("long").as("rank"), col("lhs"), col("rhs"),
        col("pair_count"))
  }

  /** Segment `textCol` with an already-trained merge list (applied in rank
    * order, same one-pass replace semantics as training): returns the
    * space-joined BPE token string per input word column. Exposed for
    * downstream token counting / vocab application.
    */
  def segment(words: DataFrame, wordCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val seg0 = concat(lit(" "),
      concat_ws(" ", regexp_extract_all(col(wordCol), lit("."), lit(0))),
      lit(" "))
    val segN = merges.foldLeft(seg0) { case (s, (l, r)) =>
      org.apache.spark.sql.functions.replace(s, lit(s" $l $r "), lit(s" $l$r "))
    }
    words.withColumn("bpe_tokens", trim(segN))
  }
}
