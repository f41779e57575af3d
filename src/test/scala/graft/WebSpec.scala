package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Pii, Text, Web}
import graft.ops.{Dedup, Dsir, Python}
import graft.ops.Pipe._

/** URL canonicalization, repetition/boilerplate signals, window dedup, and
  * the python escape hatch — hand-computed oracles on planted rows.
  */
class WebSpec extends SparkSpec {
  import spark.implicits._

  private def one(u: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any =
    Seq(u).toDF("u").select(f(col("u"))).head.get(0)

  test("url part extraction") {
    val u = "HTTPS://User@WWW.Example.CO.UK:8443/A/b%20c?x=1&uid=42&y=#sec-2"
    assert(one(u, Web.urlScheme) == "https")
    assert(one(u, Web.urlHost) == "www.example.co.uk")
    assert(one(u, Web.urlPort) == 8443L)
    assert(one(u, Web.urlPath) == "/A/b%20c")
    assert(one(u, Web.urlQuery) == "x=1&uid=42&y=")
    assert(one(u, c => Web.urlQueryParam(c, "uid")) == "42")
    assert(one(u, c => Web.urlQueryParam(c, "zz")) == "")
    assert(one(u, Web.urlFragment) == "sec-2")
    // no-scheme strings: every part is the engines' shared "" / null
    assert(one("not a url", Web.urlScheme) == "")
    assert(one("not a url", Web.urlHost) == "")
    assert(one("not a url", Web.urlPort) == null)
    // a "?" inside the fragment is fragment text, NOT a query
    assert(one("http://h/p#sec?tab=2", Web.urlQuery) == "")
    assert(one("http://h/p#sec?tab=2", Web.urlFragment) == "sec?tab=2")
    assert(one("http://h/p#sec?tab=2", Web.urlNormalize) == "http://h/p")
  }

  test("registered domain: multi-part public suffixes take three labels") {
    assert(one("www.bbc.co.uk", Web.registeredDomain) == "bbc.co.uk")
    assert(one("a.b.news.example.com.au", Web.registeredDomain) == "example.com.au")
    assert(one("deep.sub.example.com", Web.registeredDomain) == "example.com")
    assert(one("example.org", Web.registeredDomain) == "example.org")
    assert(one("localhost", Web.registeredDomain) == "localhost")
    // hosts are case-insensitive: uppercase input must not dodge the suffix set
    assert(one("WWW.BBC.CO.UK", Web.registeredDomain) == "bbc.co.uk")
  }

  test("url normalization: case, default ports, fragment, empty path") {
    assert(one("HTTP://EXAMPLE.com:80?q=1#top", Web.urlNormalize) ==
      "http://example.com/?q=1")
    assert(one("https://Example.com:443/x", Web.urlNormalize) == "https://example.com/x")
    assert(one("https://example.com:8443/x", Web.urlNormalize) ==
      "https://example.com:8443/x")
    assert(one("http://user:pw@Host.com/p", Web.urlNormalize) == "http://host.com/p")
    // non-URLs pass through so the function is safe over dirty columns
    assert(one("garbage", Web.urlNormalize) == "garbage")
  }

  test("repetition signals match hand computation") {
    // "a b a b a": 2-gram windows [ab, ba, ab, ba] -> max mult 2, top2 = 2*2/5
    val df = Seq("a b a b a").toDF("text")
    assert(df.select(Text.topNgramFraction(col("text"), 2)).head.getDouble(0) == 0.8)
    // 3-gram windows [aba, bab, aba]: "aba" repeats -> 2 of 3 windows are dups
    assert(df.select(Text.dupNgramFraction(col("text"), 3)).head.getDouble(0) == 2.0 / 3.0)
    // shorter than n -> no windows -> 0.0 (not null, not division error)
    val short = Seq("only two").toDF("text")
    assert(short.select(Text.topNgramFraction(col("text"), 3)).head.getDouble(0) == 0.0)
    assert(Seq("").toDF("text").select(Text.dupNgramFraction(col("text"), 2))
      .head.getDouble(0) == 0.0)
    // self-overlapping gram ("a a" × 4 in 5 tokens) caps at 1.0, stays a fraction
    assert(Seq("a a a a a").toDF("text")
      .select(Text.topNgramFraction(col("text"), 2)).head.getDouble(0) == 1.0)
  }

  test("duplicate-line signals match hand computation") {
    val df = Seq("xx\nyy\nxx\nzzz").toDF("t")
    // 4 lines, 3 distinct -> 1/4 duplicate lines
    assert(df.select(Text.dupLineFraction(col("t"))).head.getDouble(0) == 0.25)
    // repeated chars: second "xx" = 2 chars of 2+2+2+3 = 9 total
    assert(df.select(Text.dupLineCharFraction(col("t"))).head.getDouble(0) == 2.0 / 9.0)
    assert(Seq("").toDF("t").select(Text.dupLineCharFraction(col("t")))
      .head.getDouble(0) == 0.0)
  }

  test("c4Clean/c4Keep: line rules and doc poisons match the published spec") {
    val page = Seq(
      "Too short line.",                                          // < 5 words
      "This is a proper sentence with enough words.",             // keep
      "no terminal punct here at all",                            // no [.!?"]
      "This line mentions javascript and should be dropped.",     // js
      "Another proper sentence keeps the filter content alive.",  // keep
      "A third proper sentence rounds out the document nicely."   // keep
    ).mkString("\n")
    val row = Seq(page).toDF("t")
      .select(Text.c4Clean(col("t")).as("c"),
        Text.c4Keep(col("t"), Text.c4Clean(col("t"))).as("k"))
      .select(col("c.clean_text"), col("c.kept_lines"), col("c.total_lines"), col("k"))
      .head
    assert(row.getLong(1) == 3L && row.getLong(2) == 6L && row.getBoolean(3))
    assert(row.getString(0) ==
      Seq("This is a proper sentence with enough words.",
        "Another proper sentence keeps the filter content alive.",
        "A third proper sentence rounds out the document nicely.").mkString("\n"))
    // doc-level poisons: curly brace / lorem ipsum / < 3 surviving lines
    def keep(t: String): Boolean =
      Seq(t).toDF("t").select(Text.c4Keep(col("t"), Text.c4Clean(col("t"))))
        .head.getBoolean(0)
    assert(!keep(page + "\nvar x = {1};"))
    assert(!keep(page + "\nSome Lorem Ipsum filler sits here today."))
    assert(!keep(page.linesIterator.take(3).mkString("\n"))) // only 1 keeper
  }

  test("gopherSignals/gopherKeep: each signal matches hand computation") {
    def sig(t: String, f: String): Any =
      Seq(t).toDF("t").select(Text.gopherSignals(col("t")).getField(f)).head.get(0)
    assert(sig("the cat sat", "n_words") == 3L)
    assert(sig("the cat sat", "mean_word_len") == 3.0)
    assert(sig("a # b … c", "hash_ratio") == 0.2)          // '#' alone, of 5
    assert(sig("a # b … c", "ellipsis_ratio") == 0.2)      // '…' alone, of 5
    // per-symbol thresholds (Rae Table A1): 0.06 + 0.06 must PASS both
    // ratios even though a combined ratio would read 0.12 > 0.1
    val mixed = (Seq.fill(44)("plain") ++ Seq.fill(3)("tag#x") ++
      Seq.fill(3)("end…")).mkString(" ")
    assert(sig(mixed, "hash_ratio").asInstanceOf[Double] <= 0.1)
    assert(sig(mixed, "ellipsis_ratio").asInstanceOf[Double] <= 0.1)
    assert(sig("- x\ny\n* z", "bullet_frac") == 2.0 / 3.0)
    assert(sig("end...\nplain", "ellipsis_frac") == 0.5)
    assert(sig("abc 123 x9", "alpha_frac") == 2.0 / 3.0)   // abc, x9
    assert(sig("the dog and the cat have fun", "stop_hits") == 3L) // the,and,have
    def keep(t: String): Boolean =
      Seq(t).toDF("t").select(Text.gopherKeep(Text.gopherSignals(col("t"))))
        .head.getBoolean(0)
    // 60 plain words with ≥2 required stopwords -> passes every band
    val good = (Seq.fill(29)("the data") :+ "and words").mkString(" ")
    assert(keep(good))
    assert(!keep("the data and words"))                     // < 50 words
    assert(!keep(good + " " + Seq.fill(10)("# # # # # #").mkString(" "))) // symbols
  }

  test("Classify.train: in-JVM batch-perceptron replay matches exactly") {
    val rows = Seq(
      (0L, "good solid content", 1L),
      (1L, "bad spam junk", -1L),
      (2L, "good content again", 1L),
      (3L, "junk spam waste", -1L))
    val docs = rows.toDF("id", "text", "label")
    val B = 4096
    def bucket(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % B
    }
    // scalar replay of the documented batch rule
    var w = Map.empty[Long, Long]
    var stop = false
    for (_ <- 1 to 3 if !stop) {
      val mis = rows.filter { case (_, text, y) =>
        y * text.split(" ").map(t => w.getOrElse(bucket(t), 0L)).sum <= 0L
      }
      if (mis.isEmpty) stop = true
      else {
        val grad = mis.flatMap { case (_, text, y) => text.split(" ").map(t => bucket(t) -> y) }
          .groupBy(_._1).map { case (b, vs) => b -> vs.map(_._2).sum }
        w = (w.keySet ++ grad.keySet).iterator
          .map(b => b -> (w.getOrElse(b, 0L) + grad.getOrElse(b, 0L)))
          .filter(_._2 != 0L).toMap
      }
    }
    val fitted = graft.ops.Classify.train(docs, "text", "label", buckets = B, rounds = 3)
    assert(fitted == w)
    // disjoint class vocab -> the fit separates the planted set
    val preds = docs
      .select(col("label"), graft.ops.Classify.predictCol(col("text"), fitted, B))
      .collect()
    assert(preds.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("windowDup finds exactly the planted shared k-token span") {
    val docs = Seq(
      (1L, "p q r s t u v"), // shares the 4-token span p q r s t with doc 2
      (2L, "z0 z1 p q r s t z2"),
      (3L, "m n o aa bb cc dd"), // no shared window with anyone
      (4L, "too short")).toDF("doc_id", "text")
    val got = Dedup.windowDup(docs, "text", "doc_id", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // shared 4-token windows between 1 and 2: "p q r s" and "q r s t"
    assert(got == Set((1L, 2L, 2L)))
  }

  test("windowDup maxDocFreq drops boilerplate windows") {
    val boiler = (0 until 6).map(i => (i.toLong, "same same same same"))
    val df = boiler.toDF("doc_id", "text")
    // window "same same same same" appears in 6 docs; cap at 5 -> no pairs
    assert(Dedup.windowDup(df, "text", "doc_id", k = 4, maxDocFreq = Some(5)).count() == 0)
    assert(Dedup.windowDup(df, "text", "doc_id", k = 4).count() == 15) // 6 choose 2
  }

  test("python op: per-row code mutates, adds, and drops rows") {
    val in = Seq((1L, 2.5, "keep"), (2L, 4.0, "drop"), (3L, 0.5, "keep"))
      .toDF("id", "x", "tag")
    val out = Python.python_(in,
      "event['y'] = event['x'] * 2\n" +
        "if event['tag'] == 'drop':\n    event = None",
      StructType(Seq(StructField("id", LongType), StructField("x", DoubleType),
        StructField("tag", StringType), StructField("y", DoubleType))))
    val rows = out.collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
      r.getDouble(3))).toSet
    assert(rows == Set((1L, 2.5, "keep", 5.0), (3L, 0.5, "keep", 1.0)))
  }

  test("python op: null fields arrive as None and survive the round trip") {
    val in = Seq((1L, Some("a")), (2L, None)).map { case (i, s) => (i, s.orNull) }
      .toDF("id", "s")
    val out = Python.python_(in,
      "event['has'] = event['s'] is not None",
      StructType(Seq(StructField("id", LongType), StructField("s", StringType),
        StructField("has", BooleanType))))
    val rows = out.collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getBoolean(2))).toSet
    assert(rows == Set((1L, Some("a"), true), (2L, None, false)))
  }

  test("python op: a raising user script FAILS the job instead of truncating") {
    val in = Seq((1L, 1.0), (2L, 0.0), (3L, 4.0)).toDF("id", "x")
    val out = Python.python_(in, "event['y'] = 1.0 / event['x']",
      StructType(Seq(StructField("id", LongType), StructField("x", DoubleType),
        StructField("y", DoubleType))))
    val e = intercept[Exception](out.collect())
    // the child's traceback must surface in the failure, not vanish
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).take(10).flatMap(t => Option(t.getMessage)).mkString("\n")
    assert(messages.contains("ZeroDivisionError"), messages.take(500))
  }

  test("python op: dotted top-level column names survive (flattened frames)") {
    val in = Seq((1L, "GET"), (2L, "POST")).toDF("id", "http.method")
    val out = Python.python_(in, "event['m2'] = event['http.method'].lower()",
      StructType(Seq(StructField("id", LongType), StructField("http.method", StringType),
        StructField("m2", StringType))))
    assert(out.select(col("m2")).as[String].collect().toSet == Set("get", "post"))
  }

  test("decontaminate flags shingle overlap with the benchmark set") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a completely different sentence with no overlap at all"),
      (3L, "quick brown fox jumps high today")  // shares 2 shingles with doc 1
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(docs, bench, "text", "doc_id", n = 3, minHits = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // doc 1 shares "the quick brown", "quick brown fox", "brown fox jumps"
    assert(out(1L) == (3L, true))
    // doc 3 shares "quick brown fox", "brown fox jumps"
    assert(out(3L) == (2L, true))
    assert(!out.contains(2L))
    // plan: benchmark side must broadcast
    val plan = Dedup.decontaminate(docs, bench, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("pii: detects and redacts all four classes; clean text untouched") {
    val df = Seq(
      (1L, "Mail bob.smith+x@sub.example.co.uk or call +44 020-7946-0958 now"),
      (2L, "server 192.168.1.254 ssn 123-45-6789"),
      (3L, "no pii here, just 3.14 and a date 2026-08-19"),
      (4L, "dial 555 867 5309 ok")
    ).toDF("id", "text")
    val out = df.select($"id",
        Pii.countEmails($"text").as("e"), Pii.countIpv4($"text").as("i"),
        Pii.countSsn($"text").as("s"), Pii.countPhones($"text").as("p"),
        Pii.redact($"text").as("r"), Pii.hasPii($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 1 && out(1L).getInt(4) == 1)
    assert(out(1L).getString(5) == "Mail <EMAIL> or call <PHONE> now")
    assert(out(2L).getInt(2) == 1 && out(2L).getInt(3) == 1)
    assert(out(2L).getString(5) == "server <IP> ssn <SSN>")
    assert(!out(3L).getBoolean(6))
    assert(out(3L).getString(5) == "no pii here, just 3.14 and a date 2026-08-19")
    assert(out(4L).getString(5) == "dial <PHONE> ok" && out(4L).getBoolean(6))
  }

  test("dedupLines drops corpus-frequent lines, keeps order, counts drops") {
    val df = Seq(
      (1L, "unique opening\nCopyright Example Corp\nmore prose"),
      (2L, "different start\nCopyright Example Corp"),
      (3L, "Copyright Example Corp"),
      (4L, null.asInstanceOf[String]) // tombstoned/fetch-failed doc: must NOT vanish
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(df, "text", "doc_id", maxFreq = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.size == 4)
    assert(out(1L) == (3L, 1L, "unique opening\nmore prose"))
    assert(out(2L) == (2L, 1L, "different start"))
    assert(out(3L) == (1L, 1L, ""))
    assert(out(4L)._1 == 1L) // the one (empty) line is counted; doc row survives
  }

  test("dsir: target-like docs outscore background-only docs; empty doc is null") {
    val target = Seq((100L, "machine learning models train on curated data"),
      (101L, "neural networks and machine learning research")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "machine learning models and neural networks research"), // target-like
      (2L, "cheap pills casino bonus click here now free"),         // background-only
      (3L, "solo"),                                                 // < n tokens → no grams
      (4L, "")
    ).toDF("doc_id", "text")
    val out = Dsir.score(docs, target, "text", "doc_id", n = 2, buckets = 256)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(4) > out(2L).getDouble(4))
    // background mass always >= own-occurrence smoothing → score <= 1 + eps
    assert(out(2L).getDouble(4) < 1.0)
    assert(out(3L).getLong(1) == 0L && out(3L).isNullAt(4))
    assert(out(4L).getLong(1) == 0L && out(4L).isNullAt(4))
    // masses are integer sums: n_grams lower-bounds both (add-one smoothing)
    val d1 = out(1L)
    assert(d1.getLong(2) >= d1.getLong(1) && d1.getLong(3) >= d1.getLong(1))
  }

  test("sampleStratified_ applies per-stratum rates deterministically") {
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    val out = df.sampleStratified_(col("lang"), Map("en" -> 0.8, "zh" -> 0.1),
      defaultRate = 0.5, idCols = Seq(col("doc_id")))
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // hash-threshold sampling: counts concentrate near rate * 1000
    assert(byLang("en") > 700 && byLang("en") < 900, byLang)
    assert(byLang("zh") > 50 && byLang("zh") < 150, byLang)
    // deterministic: same input → identical row set
    assert(out.collect().toSet ==
      df.sampleStratified_(col("lang"), Map("en" -> 0.8, "zh" -> 0.1),
        defaultRate = 0.5, idCols = Seq(col("doc_id"))).collect().toSet)
  }

  test("resolveUrl: RFC 3986 §5.4 reference-resolution examples") {
    val base = "http://a/b/c/d;p?q"
    // (href, expected) — §5.4.1 normal + §5.4.2 abnormal, minus the
    // fragment-carrying outputs (fragments are stripped by design)
    val vectors = Seq(
      "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g",
      "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q",
      "" -> "http://a/b/c/d;p?q",
      "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/",
      ".." -> "http://a/b/",
      "../" -> "http://a/b/",
      "../g" -> "http://a/b/g",
      "../.." -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g",
      // abnormal (§5.4.2): .. past the root is a no-op
      "../../../g" -> "http://a/g",
      "../../../../g" -> "http://a/g",
      "/./g" -> "http://a/g",
      "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..",
      "..g" -> "http://a/b/c/..g",
      "./../g" -> "http://a/b/g",
      "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h",
      "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      // scheme'd hrefs pass through
      "http:g" -> "http:g",
      "mailto:x@y.z" -> "mailto:x@y.z",
      // empty path segments are preserved (§5.3 only removes "." / "..")
      "/x//y" -> "http://a/x//y",
      "x//y" -> "http://a/b/c/x//y",
      "/x//../y" -> "http://a/x/y",
      // network-path references get dot-segment removal too (§5.2.2)
      "//g/h/../i" -> "http://g/i",
      "//g/./h" -> "http://g/h",
      "//g/h/.." -> "http://g/")
    val got = vectors.map(_._1).toDF("href")
      .select(col("href"), Web.resolveUrl(lit(base), col("href")).as("r"))
      .as[(String, String)].collect().toMap
    vectors.foreach { case (h, want) =>
      assert(got(h) == want, s"href '$h': got '${got(h)}', want '$want'")
    }
  }

  test("resolveUrl: double-slash base paths and empty-base-path edge cases") {
    val got = Seq(
      ("https://h/a//b/index.html", "x"),      // '//' in the BASE dir survives
      ("https://h/a//b/index.html", "/x//y"),  // and in the href path
      ("http://a", "?y"),                      // query-only, empty base path
      ("http://a", ""),                        // empty href, empty base path
      ("http://a", "g"))                       // merge onto empty base path
      .toDF("base", "href")
      .select(Web.resolveUrl(col("base"), col("href")).as("r"))
      .as[String].collect().toSeq
    assert(got == Seq(
      "https://h/a//b/x",
      "https://h/x//y",
      "http://a?y",   // §5.2.2 keeps the base path verbatim — no phantom '/'
      "http://a",
      "http://a/g"))
  }

  test("surtKey: reversed host, www strip, lowercased path, sorted params") {
    val vectors = Seq(
      "https://www.Example.COM/Docs/A?b=2&a=1" -> "com,example)/docs/a?a=1&b=2",
      "http://sub.site.co.uk/x" -> "uk,co,site,sub)/x",
      "https://example.org" -> "org,example)/",
      "http://www.single/?z=1&y=2&y=1" -> "single)/?y=1&y=2&z=1",
      // non-default ports stay in the key (distinct origins must not
      // collide); scheme-default ports are dropped (same origin)
      "https://example.net:8080/P" -> "net,example:8080)/p",
      "http://example.net:443/P" -> "net,example:443)/p",
      "https://example.net:443/P" -> "net,example)/p",
      "http://example.net:80/P" -> "net,example)/p")
    val got = vectors.map(_._1).toDF("u")
      .select(col("u"), graft.functions.Web.surtKey(col("u")).as("k"))
      .as[(String, String)].collect().toMap
    vectors.foreach { case (u, want) => assert(got(u) == want, u) }
  }

  test("Bpe.train: hand-computed merge sequence; segment applies merges in order") {
    import graft.ops.Bpe
    // vocab: aaab (freq 2), ab (freq 1)
    // iter1: pairs {a a: 4, a b: 3}            → merge (a,a)  count 4
    //        one-pass replace: "a a a b" → "aa a b" (shared-boundary defer)
    // iter2: pairs {aa a: 2, a b: 3}           → merge (a,b)  count 3
    // iter3: pairs {aa ab: 2}                  → merge (aa,ab) count 2
    val docs = Seq("aaab aaab ab").toDF("text")
    val got = Bpe.train(docs, "text", numMerges = 3)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a", "a", 4L), (2L, "a", "b", 3L), (3L, "aa", "ab", 2L)))

    val seg = Bpe.segment(Seq("aaab", "ab", "aab").toDF("w"), "w",
      Seq("a" -> "a", "a" -> "b", "aa" -> "ab"))
      .select("w", "bpe_tokens").as[(String, String)].collect().toMap
    assert(seg == Map("aaab" -> "aaab", "ab" -> "ab", "aab" -> "aa b"))
  }

  test("extractLinks: quote styles, data-href exclusion, entity decode, nesting") {
    val html =
      """<html><body>
        |<a href="/one" class="x">First <b>bold</b> link</a>
        |<p><a id="z" href="sub/two.html">second
        |link</a></p>
        |<a href="#frag">frag only</a>
        |<a href='/single'>single quoted</a>
        |<a href=/unquoted>bare</a>
        |<a data-href="/tracker" href="/real">attr suffix</a>
        |<a data-href="/phantom">no real href</a>
        |<a href="/p?a=1&amp;b=2">entities</a>
        |<img src="/not-a-link.png">
        |</body></html>""".stripMargin
    val out = Seq(html).toDF("h")
      .select(explode(Web.extractLinks(col("h"))).as("l"))
      .select("l.href", "l.anchor").as[(String, String)].collect().toSeq
    assert(out == Seq(
      ("/one", "First bold link"),
      ("sub/two.html", "second link"),
      ("#frag", "frag only"),
      ("/single", "single quoted"),
      ("/unquoted", "bare"),
      ("/real", "attr suffix"),        // href=, not data-href=
      ("/p?a=1&b=2", "entities")))     // &amp; decoded; /phantom absent
  }
}
