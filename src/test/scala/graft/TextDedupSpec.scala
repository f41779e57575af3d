package graft

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.ops.{Dedup, Similarity}

/** Text functions + dedup family + similarity search, verified against
  * independent in-JVM oracles on planted data (FIXTURES.md §4 style).
  */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  // 20 base docs + near-dups of the first 5 (one word changed) + 2 exact dups.
  private lazy val docs: Seq[(Long, String)] = {
    val base = (0 until 20).map { i =>
      val words = (0 until 30).map(j => s"w${ChangeGen.wordAt(i, j)}")
      (i.toLong, words.mkString(" "))
    }
    val nearDups = (0 until 5).map { i =>
      val words = (0 until 30).map(j => if (j == 7) "CHANGED" else s"w${ChangeGen.wordAt(i, j)}")
      (100L + i, words.mkString(" "))
    }
    val exactDups = Seq((200L, base(3)._2), (201L, "  " + base(4)._2.toUpperCase + "  "))
    base ++ nearDups ++ exactDups
  }
  private object ChangeGen { // tiny deterministic word picker
    def wordAt(doc: Int, pos: Int): Int =
      (graft.gen.ChangeGen.mix(doc.toLong * 31 + pos) & 0x7fffffffL).toInt % 50
  }
  private lazy val docsDf = docs.toDF("doc_id", "text")

  private def jaccard(a: String, b: String, n: Int): Double = {
    def sh(t: String) = {
      val w = t.toLowerCase.trim.split("\\s+").toSeq
      (if (w.size < n) Seq(w.mkString(" "))
       else w.sliding(n).map(_.mkString(" ")).toSeq).distinct.toSet
    }
    val (sa, sb) = (sh(a), sh(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
  }

  test("exact dedup groups normalized duplicates, keeps min id") {
    val out = Dedup.exact(docsDf, "text", "doc_id")
      .filter(col("n_dups") > 1).orderBy("keep_id")
      .select("keep_id", "n_dups").as[(Long, Long)].collect().toSeq
    assert(out == Seq((3L, 2L), (4L, 2L)))
  }

  test("ngramJaccard matches an independent exact computation") {
    val got = Dedup.ngramJaccard(docsDf, "text", "doc_id", shingleN = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val expected = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      j = jaccard(ta, tb, 3) if j >= 0.5
    } yield (ia, ib) -> j).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 1e-12, s"$k") }
    // the 5 near-dup pairs and 2 exact-dup pairs must be present
    assert(got.keySet.count { case (a, b) => b == a + 100 } == 5)
  }

  test("minhash LSH finds all planted near/exact dups with high estimate") {
    val pairs = Dedup.minhashLsh(docsDf, "text", "doc_id",
      bands = 16, rows = 4, threshold = 0.5)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
    (0 until 5).foreach(i => assert(pairs.contains((i.toLong, 100L + i)), s"missing near-dup $i"))
    assert(pairs.contains((3L, 200L)) && pairs.contains((4L, 201L)))
  }

  test("minhash estimate approximates exact jaccard") {
    val sig = docsDf.select(col("doc_id"),
      Dedup.minhashSignature(col("text"), k = 128, shingleN = 3).as("sig"))
    val a = sig.filter(col("doc_id") === 0).select(col("sig").as("sa"))
    val b = sig.filter(col("doc_id") === 100).select(col("sig").as("sb"))
    val est = a.crossJoin(b).select(Dedup.estJaccard(col("sa"), col("sb"), 128)).head().getDouble(0)
    val exact = jaccard(docs(0)._2, docs.find(_._1 == 100L).get._2, 3)
    assert(math.abs(est - exact) < 0.15, s"est=$est exact=$exact")
  }

  test("simhash: near-dups are close in hamming, random pairs far") {
    val sh = docsDf.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    (0 until 5).foreach { i =>
      assert(ham(sh(i.toLong), sh(100L + i)) <= 12, s"near-dup $i too far")
    }
    assert(ham(sh(0L), sh(10L)) > 12)
    // segment-blocked candidate generation finds the near pairs it promises:
    // any pair with hamming <= 3 must be emitted (pigeonhole over 4 segments)
    val found = Dedup.simhashDup(docsDf, "text", "doc_id", maxHamming = 3, segments = 4)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val allClose = (for {
      (ia, _) <- docs; (ib, _) <- docs if ia < ib
      h = ham(sh(ia), sh(ib)) if h <= 3
    } yield (ia, ib) -> h.toLong).toMap
    assert(found == allClose)
  }

  test("text functions: tokens, fingerprints, quality, langid") {
    val t = Seq((1L, "  The  quick brown fox  "), (2L, "der und das ist nicht ein gut tag"))
      .toDF("doc_id", "text")
    val r = t.select(
      Text.tokenCount(col("text")).as("n"),
      Text.fingerprintMd5(col("text")).as("fp"),
      Text.langId(col("text")).as("lang")).orderBy("n").collect()
    assert(r(0).getLong(0) == 4L && r(1).getLong(0) == 8L)
    // fingerprint is normalization-invariant
    val fp2 = t.select(Text.fingerprintMd5(lit("the QUICK   brown fox"))).head().getString(0)
    assert(r(0).getString(1) == fp2)
    assert(r(1).getString(2) == "de")
    // quality score bounded
    val q = docsDf.select(Text.qualityScore(col("text"))).as[Double].collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
  }

  // ----------------------------------------------------------- similarity

  private lazy val vecs: Seq[(Long, Array[Float])] = (0 until 60).map { i =>
    val cluster = i % 4
    val base = Array.tabulate(16)(d =>
      math.sin(cluster * 3.7 + d).toFloat * 2f)
    val noise = Array.tabulate(16)(d =>
      ((graft.gen.ChangeGen.mix(i.toLong * 131 + d) % 1000) / 4000.0f))
    (i.toLong, base.zip(noise).map { case (b, n) => b + n })
  }

  test("bruteForceTopK matches a driver-side exact computation") {
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(df, df.filter(col("vec_id") < 3), "embedding", "vec_id", k = 4)
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.sortBy(_._4).map(_._2).toSeq }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    (0L until 3L).foreach { q =>
      val expected = vecs.filter(_._1 != q)
        .map { case (id, v) => (id, cos(vecs(q.toInt)._2, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(4).map(_._1)
      assert(got(q) == expected, s"query $q")
    }
  }

  test("lshTopK achieves high recall on clustered vectors") {
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(df, queries, "embedding", "vec_id", k = 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(df, queries, "embedding", "vec_id", k = 5,
      planes = 12, bands = 6)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
  }

  test("ivfTopK with nprobe = nlist degenerates to exact brute force") {
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(df, queries, "embedding", "vec_id", k = 5)
      .as[(Long, Long, Double, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(df, queries, "embedding", "vec_id", k = 5,
      nlist = 6, nprobe = 6)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(ivf == exact)
  }

  test("ivfTopK achieves high recall on clustered vectors at nprobe < nlist") {
    val df = vecs.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(df, queries, "embedding", "vec_id", k = 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(df, queries, "embedding", "vec_id", k = 5,
      nlist = 8, nprobe = 3)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
    // every returned candidate's rank ordering is exact-cosine consistent
    assert(approx.subsetOf(
      df.crossJoin(queries.select(col("vec_id").as("q"))).filter(col("vec_id") =!= col("q"))
        .select(col("q"), col("vec_id")).as[(Long, Long)].collect().toSet))
  }

  test("embeddingDup finds same-cluster high-cosine pairs") {
    val df = vecs.toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingDup(df, "embedding", "vec_id", threshold = 0.99,
      planes = 8, bands = 4)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, c) =>
      assert(a % 4 == b % 4, s"cross-cluster pair ($a,$b) cos=$c")
      assert(c >= 0.99)
    }
  }

  test("duplicatedSpans finds exactly the planted repeated passage") {
    val passage = (0 until 10).map(i => s"dup$i").mkString(" ")
    val df = Seq(
      (0L, ((0 until 20).map(j => s"a$j") :+ passage).mkString(" ") + " " +
        (0 until 10).map(j => s"b$j").mkString(" ")),
      (1L, ((0 until 10).map(j => s"c$j") :+ passage).mkString(" ") + " " +
        (0 until 20).map(j => s"d$j").mkString(" ")),
      (2L, (0 until 40).map(j => s"e$j").mkString(" "))).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(df, "text", "doc_id", k = 5, minFreq = 2)
      .select("doc_id", "span_start", "span_end", "n_windows")
      .as[(Long, Long, Long, Long)].collect().toSet
    // passage occupies positions 20..29 in doc 0 and 10..19 in doc 1;
    // boundary windows are unique, so the span is exactly the passage
    assert(spans == Set((0L, 20L, 30L, 6L), (1L, 10L, 20L, 6L)))

    val clean = Dedup.removeDuplicatedSpans(df, "text", "doc_id", k = 5, minFreq = 2)
      .select("doc_id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(clean(0L) == ((0L, 40L, 10L,
      ((0 until 20).map(j => s"a$j") ++ (0 until 10).map(j => s"b$j")).mkString(" "))))
    assert(clean(1L) == ((1L, 40L, 10L,
      ((0 until 10).map(j => s"c$j") ++ (0 until 20).map(j => s"d$j")).mkString(" "))))
    assert(clean(2L)._3 == 0L) // untouched
    assert(clean(2L)._4 == (0 until 40).map(j => s"e$j").mkString(" "))
  }

  test("dedupIncremental flags exact clones and near-dups vs the existing set") {
    val near1 = docs.find(_._1 == 1L).get._2.split(" ").toSeq
      .updated(3, "TWEAKED").mkString(" ")
    val incoming = Seq(
      (1000L, docs.find(_._1 == 0L).get._2), // exact clone of doc 0
      (1001L, near1),                        // near-dup of doc 1
      (1002L, (0 until 30).map(j => s"fresh$j").mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.dedupIncremental(incoming, docsDf, "text", "doc_id",
      bands = 16, rows = 2, threshold = 0.5)
      .as[(Long, Boolean, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1000L)._2, "clone must flag is_exact")
    assert(out(1000L)._3.contains(0L) && out(1000L)._4.contains(1.0))
    assert(!out(1001L)._2)
    assert(out(1001L)._3.contains(1L) && out(1001L)._4.exists(_ >= 0.5))
    assert(!out(1002L)._2 && out(1002L)._3.isEmpty)
  }
}
