package graft

import org.apache.spark.sql.functions._

import graft.ops.{Cluster, Rank, Similarity}

/** Connected-components dup clustering + BM25 ranking, verified against
  * independent in-JVM oracles (FIXTURES.md §4 style).
  */
class ClusterRankSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: transitive closure, min-id labels") {
    // components: {1,2,3,4} (a path — A~B, B~C, C~D, no direct A~D edge),
    // {10,11} and {20,21,22} (a triangle); 99 isolated (absent from edges)
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id_a", "id_b")
    val got = Cluster.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
    assert(got == want)
  }

  test("connectedComponents: long path needs multiple rounds, still exact") {
    // a 40-node path — diameter 39 forces many propagation rounds and
    // crosses the localCheckpoint cadence; all nodes must land on label 0
    val edges = (0L until 39L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Cluster.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(got.size == 40 && got.values.forall(_ == 0L))
  }

  test("connectedComponents: empty edge list") {
    val edges = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Cluster.connectedComponents(edges).isEmpty)
  }

  test("connectedComponents: exhausting maxRounds fails loudly, never silently wrong") {
    // diameter 9 path with maxRounds=3: labels cannot all reach 0 — returning
    // them would make survivors() keep duplicate docs, so it must throw
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ex = intercept[IllegalStateException] {
      Cluster.connectedComponents(edges, maxRounds = 3).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("survivors keeps min-id per component plus isolated docs") {
    val docs = (1L to 12L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val keep = Cluster.survivors(docs, edges, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(keep == Set(1L, 4L, 5L, 6L, 7L, 8L, 10L, 11L, 12L))
  }

  test("kmeans: matches an independent scalar Lloyd's reimplementation") {
    // two well-separated planted blobs in 4-d (floats exactly representable)
    // ids 0 and 1 (the deterministic seeds) sit in different blobs
    val pts = Seq(
      (0L, Seq(1.0f, 1.0f, 0.0f, 0.0f)), (1L, Seq(-1.0f, -1.0f, 0.0f, 0.5f)),
      (2L, Seq(0.75f, 1.25f, 0.25f, 0.0f)), (3L, Seq(1.25f, 0.75f, 0.0f, 0.0f)),
      (4L, Seq(-1.25f, -0.75f, 0.0f, 0.5f)), (5L, Seq(-0.75f, -1.25f, 0.25f, 0.5f)))
    val df = pts.toDF("vec_id", "embedding")
    val (adf, cents) = Similarity.kmeans(df, "embedding", "vec_id", k = 2, iterations = 3)
    val got = adf.as[(Long, Long)].collect().toMap

    // scalar twin with the same integer rule
    def quant(v: Seq[Float]): Array[Long] =
      v.map(x => Math.round(x.toDouble * 1024.0 + 4096.0)).toArray
    val q = pts.map { case (id, v) => id -> quant(v) }.toMap
    var c = Seq(q(0L), q(1L)) // init: two smallest ids
    def assignAll = q.map { case (id, v) =>
      id -> c.zipWithIndex.map { case (cv, ci) =>
        (cv.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum, ci)
      }.min._2
    }
    for (_ <- 1 to 3) {
      val a = assignAll
      c = c.zipWithIndex.map { case (prev, ci) =>
        val members = a.collect { case (id, cl) if cl == ci => q(id) }.toSeq
        if (members.isEmpty) prev
        else prev.indices.map(d => members.map(_(d)).sum / members.size).toArray
      }
    }
    assert(got == assignAll.map { case (id, cl) => id -> cl.toLong })
    assert(cents.map(_.toSeq).toSeq == c.map(_.toSeq))
    // the planted blobs are recovered
    assert(Set(got(0L), got(2L), got(3L)).size == 1 &&
      Set(got(1L), got(4L), got(5L)).size == 1 && got(0L) != got(1L))
  }

  test("kmeans centroids plug into ivfTopK's centroid seam") {
    val n = 60
    val vecs = (0L until n).map { i =>
      val blob = (i % 3).toInt
      (i, Seq.tabulate(8)(d => (if (d == blob) 2.0f else 0.1f) + (i % 5) * 0.01f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val (_, cents) = Similarity.kmeans(df, "embedding", "vec_id", k = 3, iterations = 2)
    // dequantize exactly: (c - 4096) / 1024 is a power-of-two division
    val centDf = cents.zipWithIndex.map { case (cv, i) =>
      (i.toLong, cv.map(x => ((x - Similarity.KmeansOffset).toDouble / Similarity.KmeansScale).toFloat).toSeq)
    }.toSeq.toDF("vec_id", "embedding")
    val got = Similarity.ivfTopK(df, df.filter(col("vec_id") < 3), "embedding", "vec_id",
      k = 5, nlist = 3, nprobe = 1, centroids = Some(centDf))
    // probing 1 fitted list per query still recovers the same-blob neighbors
    val exact = Similarity.bruteForceTopK(df, df.filter(col("vec_id") < 3),
      "embedding", "vec_id", k = 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val gotSet = got.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(gotSet.size == 15 && (gotSet intersect exact).size >= 12)
  }

  test("hits: integer hubs/authorities match a scalar reimplementation") {
    val edgeList = Seq((0L, 1L), (0L, 2L), (0L, 3L), (4L, 1L), (5L, 1L), (1L, 2L))
    val got = Rank.hits(edgeList.toDF("src", "dst"), iterations = 3)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // scalar twin with the identical integer sum + truncating rescale
    val nodes = edgeList.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val init = 1000000L
    var hub = nodes.map(_ -> init).toMap
    var auth = nodes.map(_ -> init).toMap
    for (_ <- 1 to 3) {
      val araw = nodes.map(nd =>
        nd -> edgeList.filter(_._2 == nd).map(x => hub(x._1)).sum).toMap
      val asc = math.max(araw.values.max / init, 1L)
      auth = araw.map { case (k, v) => k -> v / asc }
      val hraw = nodes.map(nd =>
        nd -> edgeList.filter(_._1 == nd).map(x => auth(x._2)).sum).toMap
      val hsc = math.max(hraw.values.max / init, 1L)
      hub = hraw.map { case (k, v) => k -> v / hsc }
    }
    nodes.foreach(nd => assert(got(nd) == (hub(nd), auth(nd)), s"node $nd"))
    // the planted structure: node 1 is the top authority, node 0 the top hub
    assert(auth(1L) == auth.values.max && hub(0L) == hub.values.max)
  }

  test("pq: codes recover planted blobs per subspace; ADC agrees with exact on reconstructions") {
    import graft.ops.Pq
    // 8-d vectors = 2 subspaces of 4; each half carries its own 2-blob
    // structure so the per-subspace codebooks must separate independently
    val n = 40
    val vecs = (0L until n).map { i =>
      val b0 = (i % 2).toInt          // blob in subspace 0
      val b1 = ((i / 2) % 2).toInt    // blob in subspace 1
      (i,
        Seq.tabulate(4)(d => (if (b0 == 0) 1.0f else -1.0f) + d * 0.01f + (i % 5) * 0.002f) ++
          Seq.tabulate(4)(d => (if (b1 == 0) 0.5f else 2.5f) - d * 0.01f + (i % 7) * 0.002f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val books = Pq.fit(df, "embedding", "vec_id", m = 2, k = 2, iterations = 3)
    val enc = Pq.encode(df, "embedding", "vec_id", books)
    val got = enc.select("vec_id", "code0", "code1", "recon_err")
      .as[(Long, Long, Long, Long)].collect()
    val code0 = got.map(r => r._1 -> r._2).toMap
    val code1 = got.map(r => r._1 -> r._3).toMap
    // each subspace's codes split exactly along its planted blob
    assert(vecs.forall { case (i, _) => code0(i) == code0(i % 2) })
    assert(vecs.forall { case (i, _) => code1(i) == code1((i / 2) % 2 * 2) })
    assert(got.forall(_._4 >= 0L))

    // ADC top-k must equal brute-force integer L2 against the RECONSTRUCTED
    // corpus (computed here scalar-side from the same codebooks)
    val queries = df.filter(col("vec_id") < 2)
    val adc = Pq.adcTopK(enc, queries, "embedding", "vec_id", books, k = 5)
      .select("query_id", "corpus_id", "adist", "rank")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap
    def quant(v: Seq[Float]): Array[Long] =
      v.map(x => Math.round(x.toDouble * 1024.0 + 4096.0)).toArray
    val qm = vecs.map { case (id, v) => id -> quant(v) }.toMap
    val codes = got.map(r => r._1 -> Seq(r._2, r._3)).toMap
    def adist(q: Long, c: Long): Long =
      (0 until 2).map { s =>
        val qs = qm(q).slice(s * 4, s * 4 + 4)
        val cw = books(s)(codes(c)(s).toInt)
        qs.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
    (0L until 2L).foreach { q =>
      val want = (0L until n).filter(_ != q)
        .map(c => (c, adist(q, c))).sortBy(t => (t._2, t._1)).take(5)
      assert(adc(q) == want, s"query $q")
    }
  }

  test("bm25: tf ordering, df discounting, length normalization") {
    val docs = Seq(
      (1L, "cat cat cat dog"),       // tf(cat)=3
      (2L, "cat dog mouse bird"),    // tf(cat)=1
      (3L, "cat cat fish fish"),     // tf(cat)=2
      (4L, "dog dog dog dog"),       // no cat; tf(dog)=4 but dog is common
      (5L, "rare rare unique unique")
    ).toDF("doc_id", "text")
    val r = Rank.bm25(docs, "text", "doc_id", Seq("cat", "rare"), topK = 3)
      .collect().map(x => ((x.getString(0), x.getLong(5)), x.getLong(1))).toMap
    // cat: tf 3 > 2 > 1 on equal-length docs
    assert(r(("cat", 1L)) == 1L && r(("cat", 2L)) == 3L && r(("cat", 3L)) == 2L)
    // rare appears only in doc 5
    assert(r(("rare", 1L)) == 5L && !r.contains(("rare", 2L)))
    // df discounting: "rare" (df=1) outscores "cat" (df=3) at equal tf —
    // recompute both scores with the independent closed form
    val all = Rank.bm25(docs, "text", "doc_id", Seq("cat", "rare"), topK = 3)
      .collect().map(x => ((x.getString(0), x.getLong(1)), x.getDouble(4))).toMap
    def score(tf: Long, dl: Long, df: Long, n: Long, sumdl: Long): Double = {
      val avgdl = sumdl.toDouble / n.toDouble
      val idf = (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5)
      idf * ((tf.toDouble * (1.2 + 1.0)) /
        (tf.toDouble + 1.2 * (1.0 - 0.75 + 0.75 * dl.toDouble / avgdl)))
    }
    assert(all(("cat", 1L)) == score(3, 4, 3, 5, 20))
    assert(all(("rare", 5L)) == score(2, 4, 1, 5, 20))
    assert(all(("rare", 5L)) > all(("cat", 1L)))
  }

  test("pagerank: matches an independent scalar reimplementation") {
    // 6-node graph with a hub (5), a dangling node (4: in-links only) and a
    // 2-cycle; masses recomputed with a Map-based fold using the same
    // integer rule
    val edgeSeq = Seq((0L, 5L), (1L, 5L), (2L, 5L), (3L, 5L), (5L, 0L),
      (0L, 1L), (1L, 0L), (3L, 4L))
    val got = Rank.pageRank(edgeSeq.toDF("src", "dst"), iterations = 5)
      .as[(Long, Long)].collect().toMap

    val nodes = edgeSeq.flatMap(e => Seq(e._1, e._2)).distinct
    val outdeg = edgeSeq.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var mass = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val recv = edgeSeq.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => mass(e._1) * 17L / 20L / outdeg(e._1)).sum
      }
      mass = nodes.map(n => n -> (150000L + recv.getOrElse(n, 0L))).toMap
    }
    assert(got == mass)
    // the hub out-ranks the no-in-link spokes (0 out-ranks the hub — it
    // receives the hub's entire out-mass — so only 2 and 3 are fair game)
    assert(got(5L) > got(2L) && got(5L) > got(3L))
  }

  test("pagerank: self-loops and duplicate edges are ignored") {
    val clean = Rank.pageRank(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), iterations = 3)
      .as[(Long, Long)].collect().toMap
    val noisy = Rank.pageRank(
      Seq((1L, 2L), (1L, 2L), (2L, 1L), (1L, 1L)).toDF("src", "dst"), iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(clean == noisy && clean.keySet == Set(1L, 2L))
  }

  test("bm25: salted two-phase top-k equals the naive global top-k") {
    // 200 docs with varying tf/dl — enough that every salt bucket is hit
    val docs = (0L until 200L).map { i =>
      val words = Seq.fill((i % 7 + 1).toInt)("term") ++ Seq.fill((i % 13).toInt)("pad")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val got = Rank.bm25(docs, "text", "doc_id", Seq("term"), topK = 10)
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    val naive = Rank.bm25(docs, "text", "doc_id", Seq("term"), topK = 200, salts = 1)
      .orderBy("rank").limit(10).select("doc_id").as[Long].collect().toSeq
    assert(got == naive)
  }

  test("lmAvgProb matches an independent in-JVM oracle and ranks text sanely") {
    def md5h60(x: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.take(15), 16)
    }
    val buckets = 64
    // 10 docs over a tiny repeating vocabulary + 1 never-repeating doc
    val corpus = (0 until 10).map { i =>
      (i.toLong, (0 until 20).map(j => s"w${(i + j) % 5}").mkString(" "))
    } :+ (99L, (0 until 20).map(j => s"unique${99}x$j").mkString(" "))
    val df = corpus.toDF("doc_id", "text")
    val got = graft.ops.Rank.lmAvgProb(df, "text", "doc_id", buckets = buckets)
      .select("doc_id", "n_grams", "sum_prob").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap

    // independent oracle: same hashed counts, same left-fold order
    def toks(t: String) = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    def grams(t: String, n: Int) = { val w = toks(t); if (w.size < n) Seq.empty
      else w.sliding(n).map(_.mkString(" ")).toSeq }
    def bkt(g: String) = java.lang.Math.floorMod(md5h60(g), buckets.toLong)
    val big = corpus.flatMap(c => grams(c._2, 2)).groupBy(bkt).map { case (k, v) => k -> v.size.toLong }
    val uni = corpus.flatMap(c => grams(c._2, 1)).groupBy(bkt).map { case (k, v) => k -> v.size.toLong }
    corpus.foreach { case (id, t) =>
      val g2 = grams(t, 2); val ctx = toks(t).take(g2.size)
      var sum = 0.0
      g2.zip(ctx).foreach { case (g, c) =>
        sum += (big.getOrElse(bkt(g), 0L) + 1).toDouble / (uni.getOrElse(bkt(c), 0L) + buckets).toDouble
      }
      assert(got(id)._1 == g2.size.toLong, s"doc $id n_grams")
      assert(got(id)._2 == sum, s"doc $id sum_prob: got ${got(id)._2} want $sum")
    }
    // the repetitive-template docs must outscore the never-repeating doc
    val avg = graft.ops.Rank.lmAvgProb(df, "text", "doc_id", buckets = buckets)
      .select("doc_id", "avg_prob").as[(Long, Option[Double])].collect().toMap
    (0 until 10).foreach(i => assert(avg(i.toLong).get > avg(99L).get))
  }
}
