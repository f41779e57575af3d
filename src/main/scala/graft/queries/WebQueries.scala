package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Pii, Text, Web}
import graft.ops.{Bpe, Classify, Dedup, Dsir, Python, Rank}
import graft.ops.Pipe._

/** Driver-checked query catalog, part 3: URL canonicalization, repetition /
  * boilerplate quality signals, exact-substring (k-token window) dedup, and
  * the `python` escape hatch — the round-2 web-pipeline additions.
  *
  * Oracle notes: URL parts are extracted with the IDENTICAL regex in both
  * engines (Java regex and RE2 agree on the character-class-only patterns);
  * repetition fractions divide the same integer pairs as doubles; the window
  * hash is the md5h60 family every other sketch oracle uses; the python-op
  * oracle relies on JSON shortest-round-trip doubles being exact in both
  * directions.
  */
object WebQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Empty-filtered normalized tokens — twin of Text.tokens(normalize(_)). */
  private val NormToks =
    "list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), t -> length(t) > 0)"

  /** 10-token passage planted at every doc's tail for the span-dedup queries
    * — guarantees each doc carries a corpus-wide duplicated span.
    */
  private val SpanTail = " the quick brown fox jumps over the lazy dog again"

  /** Shared CTE prefix for the span queries: planted tail, normalized tokens,
    * k=5 window hashes with 0-based positions, corpus-duplicated positions.
    */
  private val SpanDupCtes =
    s"""src AS (SELECT doc_id, text || '$SpanTail' AS text FROM documents),
       |toks AS (SELECT doc_id, coalesce($NormToks, []) AS w FROM src),
       |wins AS (SELECT doc_id,
       |    CASE WHEN len(w) >= 5 THEN list_transform(generate_series(1, len(w) - 4),
       |      i -> ('0x' || substr(md5(array_to_string(w[i:i+4], ' ')), 1, 15))::BIGINT)
       |    ELSE [] END AS whs
       |  FROM toks),
       |e AS (SELECT doc_id, unnest(whs) AS wh, generate_subscripts(whs, 1) - 1 AS pos FROM wins),
       |f AS (SELECT wh FROM e GROUP BY wh HAVING count(*) >= 2),
       |dup AS (SELECT doc_id, pos FROM e WHERE wh IN (SELECT wh FROM f))""".stripMargin

  /** Planted multi-line page for the C4/Gopher filter queries (Spark side).
    * Mirrored verbatim by [[PageSql]]. Line inventory: real text with a
    * terminal period (C4-keep when long enough), a no-terminal-punct line,
    * a bullet line, a javascript line, a clean keeper line, then three
    * doc_id-conditional poisons (too-short line, lorem ipsum, curly brace),
    * and an ellipsis-terminated tail line.
    */
  private def plantedPageCol: Column = concat(
    col("text"), lit(".\n"),
    lit("Click here to read more\n"),
    lit("- bullet item "), col("doc_id").cast("string"), lit("\n"),
    lit("This line mentions JavaScript everywhere today.\n"),
    lit("A solid sentence with the usual words that have meaning.\n"),
    when(pmod(col("doc_id"), lit(3)) === 0, lit("short one.\n")).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(5)) === 0,
      lit("lorem ipsum dolor sit amet today.\n")).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(7)) === 0,
      lit("var x = {1}; call it done today.\n")).otherwise(lit("")),
    lit("And so it continues..."))

  /** The same planted page in DuckDB SQL (doc_id is non-negative, % ≡ pmod). */
  private val PageSql =
    """text || '.' || chr(10) ||
      |'Click here to read more' || chr(10) ||
      |'- bullet item ' || CAST(doc_id AS VARCHAR) || chr(10) ||
      |'This line mentions JavaScript everywhere today.' || chr(10) ||
      |'A solid sentence with the usual words that have meaning.' || chr(10) ||
      |(CASE WHEN doc_id % 3 = 0 THEN 'short one.' || chr(10) ELSE '' END) ||
      |(CASE WHEN doc_id % 5 = 0 THEN 'lorem ipsum dolor sit amet today.' || chr(10) ELSE '' END) ||
      |(CASE WHEN doc_id % 7 = 0 THEN 'var x = {1}; call it done today.' || chr(10) ELSE '' END) ||
      |'And so it continues...'""".stripMargin

  // ------------------------------------------------------- synthesized URL

  /** The synthesized URL (Spark side). Mirrored verbatim by [[UrlSql]]. */
  private def urlExpr: Column = {
    val dom = element_at(
      array(lit("example.co.uk"), lit("data.example.com"), lit("news.site.org"),
        lit("deep.sub.example.com.au"), lit("single")),
      (pmod(col("event_id"), lit(5)) + 1).cast("int"))
    concat(
      when(pmod(col("event_id"), lit(3)) === 0, lit("https")).otherwise(lit("http")),
      lit("://"),
      when(pmod(col("user_id"), lit(2)) === 0, concat(lit("WWW."), dom)).otherwise(dom),
      when(pmod(col("event_id"), lit(5)) === 0, lit(":8080"))
        .when(pmod(col("event_id"), lit(5)) === 1, lit(":443"))
        .otherwise(lit("")),
      when(pmod(col("event_id"), lit(7)) === 0, lit(""))
        .otherwise(concat(lit("/"), col("event_type"), lit("/p"),
          col("event_id").cast("string"))),
      when(pmod(col("event_id"), lit(2)) === 0,
        concat(lit("?uid="), col("user_id").cast("string"), lit("&ref=feed")))
        .otherwise(lit("")),
      when(pmod(col("event_id"), lit(4)) === 0, lit("#frag")).otherwise(lit("")))
  }

  /** The same URL in DuckDB SQL (event_id/user_id are non-negative, so % ≡
    * pmod).
    */
  private val UrlSql =
    """(CASE WHEN event_id % 3 = 0 THEN 'https' ELSE 'http' END) || '://' ||
      |(CASE WHEN user_id % 2 = 0 THEN 'WWW.' ELSE '' END) ||
      |(['example.co.uk','data.example.com','news.site.org','deep.sub.example.com.au','single'])[CAST(event_id % 5 AS INT) + 1] ||
      |(CASE WHEN event_id % 5 = 0 THEN ':8080' WHEN event_id % 5 = 1 THEN ':443' ELSE '' END) ||
      |(CASE WHEN event_id % 7 = 0 THEN '' ELSE '/' || event_type || '/p' || CAST(event_id AS VARCHAR) END) ||
      |(CASE WHEN event_id % 2 = 0 THEN '?uid=' || CAST(user_id AS VARCHAR) || '&ref=feed' ELSE '' END) ||
      |(CASE WHEN event_id % 4 = 0 THEN '#frag' ELSE '' END)""".stripMargin

  // --------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ------------------------------------ URL canonicalization (web module)
    "q_urlfns" -> ((s, d) => {
      val u = urlExpr
      t(s, d, "events").select(
        col("event_id"), u.as("url"),
        Web.urlScheme(u).as("scheme"),
        Web.urlHost(u).as("host"),
        Web.urlPort(u).as("port"),
        Web.urlPath(u).as("path"),
        Web.urlQuery(u).as("query"),
        Web.urlQueryParam(u, "uid").as("uid"),
        Web.urlFragment(u).as("fragment"),
        Web.registeredDomain(Web.urlHost(u)).as("reg_domain"),
        Web.urlNormalize(u).as("canonical"))
    }),

    // ------------------- link extraction + RFC 3986 reference resolution
    // (the link-graph edge emitter: href/anchor pairs out of HTML, resolved
    // against the page URL — feeds Rank.pagerank / frontier seeding). The
    // planted page exercises every resolution branch: absolute, protocol-
    // relative, root-relative, path-relative, ../ merge, fragment-only,
    // foreign scheme, query-only.
    "q_extract_links" -> ((s, d) => {
      val base = concat(lit("https://"), col("source"), lit("/dir/sub/index.html"))
      val html = concat(
        lit("<html><body><p>intro</p>"),
        lit("<a href=\"https://ext.example.org/abs\">Absolute <b>link</b></a>"),
        lit("<a href=\"//cdn.example.net/lib\">CDN</a>"),
        lit("<a href=\"/root/page\">Root</a>"),
        lit("<a href=\"item/"), col("doc_id").cast("string"),
        lit(".html\">Item "), col("doc_id").cast("string"), lit("</a>"),
        lit("<a href=\"../up/page?x=1\">Up</a>"),
        lit("<a href=\"#frag\">Frag</a>"),
        lit("<a href=\"mailto:x@y.z\">Mail</a>"),
        lit("<a href=\"?q=2\">Query</a>"),
        lit("</body></html>"))
      t(s, d, "documents")
        .select(col("doc_id"), base.as("__base"),
          posexplode(Web.extractLinks(html)).as(Seq("link_no", "__l")))
        .select(col("doc_id"), col("link_no").cast("long").as("link_no"),
          col("__l.href").as("href"),
          Web.resolveUrl(col("__base"), col("__l.href")).as("resolved"),
          col("__l.anchor").as("anchor"))
    }),

    // ------------------------ anchor-text index (incoming-link aggregation)
    // the search-engine-style inverted view of the link graph: per resolved
    // target, how many documents link to it and with what anchor texts —
    // groupBy(resolved) with map-side-combinable count + collect_set
    "q_anchor_text" -> ((s, d) => {
      val links = queries("q_extract_links")(s, d)
      links.groupBy(col("resolved"))
        .agg(count(lit(1)).as("n_refs"),
          array_join(array_sort(collect_set(col("anchor"))), "|").as("anchors"))
    }),

    // ----------------------- crawl-frontier politeness scheduling (per-host
    // fetch slots spaced by a courtesy delay)
    "q_frontier" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          concat(lit("https://"), col("source"), lit("/p/"),
            col("doc_id").cast("string")).as("url"))
        .frontierSchedule_(col("source"), Seq(col("doc_id")), delayMs = 1500L)),

    // -------------------------- repetition / boilerplate signals (Gopher)
    "q_repetition" -> ((s, d) => {
      val ml = concat_ws("\n", col("source"), col("lang"), col("source"),
        col("lang"), col("doc_id").cast("string"))
      t(s, d, "documents").select(
        col("doc_id"),
        Text.topNgramFraction(col("text"), 2).as("top2_frac"),
        Text.dupNgramFraction(col("text"), 3).as("dup3_frac"),
        Text.dupLineFraction(ml).as("dup_line_frac"),
        Text.dupLineCharFraction(ml).as("dup_line_char_frac"))
    }),

    // ------------- C4 line/doc filter (Raffel 2020 §2.2) on planted pages
    // (the corpus has no newlines, so both engines build the same multi-line
    // page per row: real text as a terminal-punct line, then planted lines
    // covering every rule branch — no-terminal-punct, bullet, javascript,
    // too-few-words, conditional lorem-ipsum / curly-brace doc poisons)
    "q_c4_filter" -> ((s, d) => {
      val page = plantedPageCol
      val cleaned = Text.c4Clean(page)
      t(s, d, "documents").select(
        col("doc_id"),
        cleaned.getField("clean_text").as("clean_text"),
        cleaned.getField("kept_lines").as("kept_lines"),
        cleaned.getField("total_lines").as("total_lines"),
        Text.c4Keep(page, cleaned).as("keep"))
    }),

    // ------- Gopher quality rules (Rae 2021 Table A1) on the same pages
    "q_gopher_filter" -> ((s, d) => {
      val sig = Text.gopherSignals(plantedPageCol)
      t(s, d, "documents").select(
        col("doc_id"),
        sig.getField("n_words").as("n_words"),
        sig.getField("mean_word_len").as("mean_word_len"),
        sig.getField("hash_ratio").as("hash_ratio"),
        sig.getField("ellipsis_ratio").as("ellipsis_ratio"),
        sig.getField("bullet_frac").as("bullet_frac"),
        sig.getField("ellipsis_frac").as("ellipsis_frac"),
        sig.getField("alpha_frac").as("alpha_frac"),
        sig.getField("stop_hits").as("stop_hits"),
        Text.gopherKeep(sig).as("keep"))
    }),

    // ----- trainable quality classifier (hashed-bag perceptron, integer
    // weights — fastText-style corpus filter). Labels are planted: even
    // doc_ids get a "goodmark" tail (+1), odd get "badmark" (-1); the fit
    // runs 2 deterministic batch rounds that the oracle replays exactly.
    "q_classifier" -> ((s, d) => {
      val docs = t(s, d, "documents").select(
        col("doc_id"),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(col("text"), lit(" goodmark goodmark")))
          .otherwise(concat(col("text"), lit(" badmark"))).as("text"),
        when(pmod(col("doc_id"), lit(2)) === 0, 1L).otherwise(-1L).as("label"))
      val w = Classify.train(docs, "text", "label", buckets = 64, rounds = 2)
      docs.select(col("doc_id"), col("label"),
        Classify.scoreCol(col("text"), w, 64).as("score"),
        Classify.predictCol(col("text"), w, 64).as("pred"))
    }),

    // -------------------------------- BM25 keyword ranking (ops.Rank)
    "q_bm25" -> ((s, d) =>
      Rank.bm25(t(s, d, "documents"), "text", "doc_id",
        Seq("merge", "vector", "window"), k1 = 1.5, b = 0.75, topK = 10)),

    // ------------------- integer-mass PageRank over a derived link graph
    // (deterministic 3-out-link expander on doc_id — the documents table
    // carries no hyperlinks, so the link graph is a fixed pure function of
    // the corpus that both engines derive identically)
    "q_pagerank" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id").cast("long").as("id"))
      val n = docs.count() // bounded: one scalar to the driver
      val edges = docs.select(col("id").as("src"), explode(array(
        pmod(col("id") + 1, lit(n)),
        pmod(col("id") * 7 + 3, lit(n)),
        pmod(col("id") * 13 + 5, lit(n)))).as("dst"))
      Rank.pageRank(edges, iterations = 5)
        .select(col("id").as("doc_id"), col("mass"))
    }),

    // --------------- freshness-aware recrawl scheduling from change history
    // (per-url change counts/cadence from the CDC event log → mean change
    // interval → next crawl due time; all integer-epoch arithmetic)
    "q_recrawl" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(concat(lit("u"), col("user_id").cast("string")).as("url"))
        .agg(count(lit(1)).as("n_changes"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_deletes"),
          min(unix_timestamp(col("ts"))).as("first_s"),
          max(unix_timestamp(col("ts"))).as("last_s"))
        .withColumn("mean_interval_s",
          expr("(last_s - first_s) div greatest(n_changes - 1, 1)"))
        .withColumn("next_due_s", col("last_s") + col("mean_interval_s"))),

    // ------------------- WET conversion records (print → frame → parse; the
    // CC text-sidecar format an LLM pipeline actually consumes)
    "q_wet" -> ((s, d) => {
      import graft.formats.Warc
      val uri = concat(lit("https://"), col("source"), lit("/p/"),
        col("doc_id").cast("string"))
      val rid = concat(lit("<urn:uuid:doc-"), col("doc_id").cast("string"), lit(">"))
      val wet = Warc.printWet(uri, lit("2026-01-15T00:00:00Z"), rid, col("text"))
      t(s, d, "documents").select(col("doc_id"), wet.as("wet"))
        .select(col("doc_id"), col("wet"),
          Warc.parse(element_at(Warc.records(col("wet")), 1)).as("r"))
        .select(col("doc_id"), col("wet"), col("r.warc_type"),
          col("r.target_uri"), col("r.warc_date"), col("r.content_length"),
          col("r.body"))
    }),

    // ------------------- HITS hubs/authorities over the same derived graph
    "q_hits" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id").cast("long").as("id"))
      val n = docs.count() // bounded: one scalar to the driver
      val edges = docs.select(col("id").as("src"), explode(array(
        pmod(col("id") + 1, lit(n)),
        pmod(col("id") * 7 + 3, lit(n)),
        pmod(col("id") * 13 + 5, lit(n)))).as("dst"))
      Rank.hits(edges, iterations = 3)
        .select(col("id").as("doc_id"), col("hub"), col("authority"))
    }),

    // --------------------------- exact-substring (k-token window) near-dup
    "q_window_dup" -> ((s, d) =>
      Dedup.windowDup(t(s, d, "documents"), "text", "doc_id",
        k = 5, maxDocFreq = Some(50))),

    // ------------------- benchmark decontamination (eval-set shingle overlap)
    // the "benchmark" is the doc_id % 25 == 0 slice of the corpus itself —
    // guaranteed hits (self-overlap) plus realistic cross-doc collisions
    "q_decontaminate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.decontaminate(docs,
        docs.filter(pmod(col("doc_id"), lit(25)) === 0),
        "text", "doc_id", n = 3, minHits = 2)
    }),

    // --------------------- DSIR-style importance scoring (data selection)
    // target = the doc_id % 25 == 0 slice; background = the corpus itself
    "q_dsir" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dsir.score(docs, docs.filter(pmod(col("doc_id"), lit(25)) === 0),
        "text", "doc_id", n = 2, buckets = 512)
    }),

    // --------------------------- training-mix statistics (per lang × source)
    "q_mixture" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      t(s, d, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("docs"),
          sum(Text.tokenCount(col("text"))).as("tokens"))
        // #groups rows — the over-all-groups total is driver-scale by
        // construction (same justification as the global aggs in PLANS.md)
        .withColumn("token_share",
          col("tokens").cast("double") /
            sum(col("tokens")).over(Window.partitionBy()).cast("double"))
    }),

    // ------------------------------- PII detection + redaction (hygiene pass)
    // PII is planted deterministically per doc (email/phone/IP/SSN) so every
    // row exercises all four classes; the oracle recomputes the identical
    // regex chain in RE2
    "q_pii" -> ((s, d) => {
      val planted = concat(col("text"),
        lit(" Contact user"), col("doc_id"), lit("@example.org or +1 555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit("-1234, host 10."), pmod(col("doc_id"), lit(256)),
        lit(".0.7, SSN 123-45-6789."))
      t(s, d, "documents").select(col("doc_id"),
        Pii.countEmails(planted).cast("long").as("n_emails"),
        Pii.countIpv4(planted).cast("long").as("n_ips"),
        Pii.countSsn(planted).cast("long").as("n_ssn"),
        Pii.countPhones(planted).cast("long").as("n_phones"),
        Pii.redact(planted).as("redacted"))
    }),

    // --------------------- line-level dedup (CCNet-style boilerplate removal)
    // sentence breaks become lines; a planted footer line repeats corpus-wide
    // and must drop everywhere
    "q_dedup_lines" -> ((s, d) => {
      val lined = t(s, d, "documents").withColumn("text",
        concat(replace(col("text"), lit(". "), lit("\n")),
          lit("\nSubscribe to our newsletter today!")))
      Dedup.dedupLines(lined, "text", "doc_id", maxFreq = 1)
    }),

    // ----------------------- stratified mixture sampling (training-mix step)
    "q_sample_stratified" -> ((s, d) =>
      t(s, d, "documents").select("doc_id", "lang")
        .sampleStratified_(col("lang"),
          Map("en" -> 0.9, "de" -> 0.5, "zh" -> 0.1),
          defaultRate = 0.25, idCols = Seq(col("doc_id")))),

    // -------------------- exact-substring SPAN dedup (Lee et al. 2022 style)
    // a 10-token passage is planted at the tail of every doc, so every doc
    // carries ≥1 corpus-wide duplicated span; organic cross-doc window dups
    // add more. k=5 windows, minFreq=2.
    "q_dup_spans" -> ((s, d) =>
      Dedup.duplicatedSpans(
        t(s, d, "documents").withColumn("text", concat(col("text"), lit(SpanTail))),
        "text", "doc_id", k = 5, minFreq = 2)),

    // removal half: rewrite the normalized token stream with spans cut out
    "q_span_clean" -> ((s, d) =>
      Dedup.removeDuplicatedSpans(
        t(s, d, "documents").withColumn("text", concat(col("text"), lit(SpanTail))),
        "text", "doc_id", k = 5, minFreq = 2)),

    // ---------------- hashed-bigram LM quality scoring (CCNet-style filter)
    "q_lm_score" -> ((s, d) =>
      Rank.lmAvgProb(t(s, d, "documents"), "text", "doc_id", buckets = 512)),

    // ------------------- deterministic corpus shuffle (training-order perm)
    "q_shuffle" -> ((s, d) =>
      t(s, d, "documents").select("doc_id")
        .shuffle_(Seq(col("doc_id")), seed = 7L)),

    // ------------------------- hash-threshold train/valid/test assignment
    "q_split" -> ((s, d) =>
      t(s, d, "documents").select("doc_id", "lang")
        .splitHash_(Seq("train" -> 0.5, "valid" -> 0.25, "test" -> 0.25),
          Seq(col("doc_id")), seed = 42L)),

    // ------------- incremental dedup: new batch vs the already-ingested lake
    // existing = even docs; incoming = odd docs ∪ exact clones of the evens
    // (id-shifted) — every clone must flag is_exact and near-match its source
    "q_dedup_incremental" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val existing = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      val incoming = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
        .unionByName(existing.withColumn("doc_id", col("doc_id") + 1000000L))
      Dedup.dedupIncremental(incoming, existing, "text", "doc_id",
        bands = 16, rows = 2, threshold = 0.5)
    }),

    // ----------------------- SURT urlkey (CDX sort/prefix-scan canonical)
    "q_surt" -> ((s, d) => {
      val u = urlExpr
      t(s, d, "events").select(col("event_id"), u.as("url"),
        Web.surtKey(u).as("urlkey"))
    }),

    // ------------------- CDXJ index lines: print → parse roundtrip, with
    // every parsed field independently re-derived by the oracle
    "q_cdx" -> ((s, d) => {
      val url = concat(lit("https://"), col("source"), lit("/Docs/"),
        col("doc_id").cast("string"), lit("?b=2&a=1"))
      val ts14 = concat(lit("202601"),
        lpad((pmod(col("doc_id"), lit(28)) + 1).cast("string"), 2, "0"),
        lpad(pmod(col("doc_id"), lit(24)).cast("string"), 2, "0"),
        lit("3015"))
      val line = graft.formats.Cdx.printCdxj(
        url, ts14,
        (lit(200) + pmod(col("doc_id"), lit(2))).cast("int"),
        lit("text/html"),
        Text.fingerprintMd5(col("text")),
        length(col("text")).cast("long"),
        col("doc_id") * 1024L,
        concat(lit("crawl-"), pmod(col("doc_id"), lit(10)).cast("string"),
          lit(".warc.gz")))
      t(s, d, "documents").select(col("doc_id"), line.as("line"))
        .select(col("doc_id"), col("line"),
          graft.formats.Cdx.parseCdxj(col("line")).as("c"))
        .select(col("doc_id"), col("line"), col("c.urlkey"), col("c.ts"),
          col("c.url"), col("c.status"), col("c.mime"), col("c.digest"),
          col("c.length"), col("c.offset"), col("c.filename"))
    }),

    // ------------------- BPE tokenizer training (distributed merge loop)
    // 6 merges over the corpus vocabulary; the oracle unrolls the identical
    // iteration (pair count → argmax with lexicographic tiebreak → one-pass
    // literal replace) as a CTE chain, the q_pagerank pattern
    "q_bpe" -> ((s, d) => Bpe.train(t(s, d, "documents"), "text", numMerges = 6)),

    // -------------------------------------- `python` escape hatch (§2.8)
    // the subprocess interpreter is the operator under test; the oracle
    // recomputes its arithmetic + filter relationally. A deterministic 1-in-10
    // orderkey slice keeps the per-event-exec cost proportionate in the
    // catalog (the semantics are row-local, so coverage doesn't need volume).
    "q_python" -> ((s, d) => {
      val in = t(s, d, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(10)) === 0)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      Python.python_(in,
        "event['total'] = event['l_quantity'] * event['l_extendedprice']\n" +
          "if event['total'] < 20000.0:\n" +
          "    event = None",
        StructType(Seq(
          StructField("l_orderkey", LongType),
          StructField("l_linenumber", IntegerType),
          StructField("l_quantity", DoubleType),
          StructField("l_extendedprice", DoubleType),
          StructField("total", DoubleType))))
    }))

  def oracleSql: Map[String, String] = Map(

    // twin of q_extract_links: expected href/resolution/anchor recomputed
    // directly per planted link kind (the q_warc pattern — the generic
    // RFC 3986 resolver itself is pinned by WebSpec's §5.4 vector suite)
    "q_extract_links" ->
      """WITH L AS (SELECT * FROM (VALUES
        |    (0, 'https://ext.example.org/abs', 'abs', 'Absolute link'),
        |    (1, '//cdn.example.net/lib', 'cdn', 'CDN'),
        |    (2, '/root/page', 'root', 'Root'),
        |    (3, NULL, 'item', NULL),
        |    (4, '../up/page?x=1', 'up', 'Up'),
        |    (5, '#frag', 'frag', 'Frag'),
        |    (6, 'mailto:x@y.z', 'mail', 'Mail'),
        |    (7, '?q=2', 'query', 'Query')) AS t(link_no, href, kind, anchor))
        |SELECT d.doc_id, CAST(l.link_no AS BIGINT) AS link_no,
        |  coalesce(l.href, 'item/' || CAST(d.doc_id AS VARCHAR) || '.html') AS href,
        |  CASE l.kind
        |    WHEN 'abs' THEN 'https://ext.example.org/abs'
        |    WHEN 'cdn' THEN 'https://cdn.example.net/lib'
        |    WHEN 'root' THEN 'https://' || d.source || '/root/page'
        |    WHEN 'item' THEN 'https://' || d.source || '/dir/sub/item/' ||
        |      CAST(d.doc_id AS VARCHAR) || '.html'
        |    WHEN 'up' THEN 'https://' || d.source || '/dir/up/page?x=1'
        |    WHEN 'frag' THEN 'https://' || d.source || '/dir/sub/index.html'
        |    WHEN 'mail' THEN 'mailto:x@y.z'
        |    WHEN 'query' THEN 'https://' || d.source || '/dir/sub/index.html?q=2'
        |  END AS resolved,
        |  coalesce(l.anchor, 'Item ' || CAST(d.doc_id AS VARCHAR)) AS anchor
        |FROM documents d CROSS JOIN L""".stripMargin,

    // twin of q_anchor_text: the q_extract_links expansion re-aggregated
    "q_anchor_text" ->
      """WITH L AS (SELECT * FROM (VALUES
        |    (0, 'https://ext.example.org/abs', 'abs', 'Absolute link'),
        |    (1, '//cdn.example.net/lib', 'cdn', 'CDN'),
        |    (2, '/root/page', 'root', 'Root'),
        |    (3, NULL, 'item', NULL),
        |    (4, '../up/page?x=1', 'up', 'Up'),
        |    (5, '#frag', 'frag', 'Frag'),
        |    (6, 'mailto:x@y.z', 'mail', 'Mail'),
        |    (7, '?q=2', 'query', 'Query')) AS t(link_no, href, kind, anchor)),
        |links AS (SELECT
        |  CASE l.kind
        |    WHEN 'abs' THEN 'https://ext.example.org/abs'
        |    WHEN 'cdn' THEN 'https://cdn.example.net/lib'
        |    WHEN 'root' THEN 'https://' || d.source || '/root/page'
        |    WHEN 'item' THEN 'https://' || d.source || '/dir/sub/item/' ||
        |      CAST(d.doc_id AS VARCHAR) || '.html'
        |    WHEN 'up' THEN 'https://' || d.source || '/dir/up/page?x=1'
        |    WHEN 'frag' THEN 'https://' || d.source || '/dir/sub/index.html'
        |    WHEN 'mail' THEN 'mailto:x@y.z'
        |    WHEN 'query' THEN 'https://' || d.source || '/dir/sub/index.html?q=2'
        |  END AS resolved,
        |  coalesce(l.anchor, 'Item ' || CAST(d.doc_id AS VARCHAR)) AS anchor
        |FROM documents d CROSS JOIN L)
        |SELECT resolved, CAST(count(*) AS BIGINT) AS n_refs,
        |  array_to_string(list_sort(list_distinct(list(anchor))), '|') AS anchors
        |FROM links GROUP BY resolved""".stripMargin,

    // twin of q_frontier: per-host fetch slots via row_number
    "q_frontier" ->
      """SELECT doc_id, source,
        |  'https://' || source || '/p/' || CAST(doc_id AS VARCHAR) AS url,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1
        |    AS BIGINT) AS slot,
        |  CAST((row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1) * 1500
        |    AS BIGINT) AS not_before_ms
        |FROM documents""".stripMargin,

    "q_urlfns" ->
      s"""WITH u AS (SELECT event_id, $UrlSql AS url FROM events),
         |parts AS (SELECT event_id, url,
         |  lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
         |  lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)', 1)) AS host,
         |  regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]*:([0-9]+)', 1) AS port_s,
         |  regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path,
         |  regexp_extract(url, '^[^#]*?\\?([^#]*)', 1) AS query,
         |  regexp_extract(url, '#(.*)$$', 1) AS fragment
         |  FROM u),
         |typed AS (SELECT *,
         |  CASE WHEN port_s = '' THEN NULL ELSE CAST(port_s AS BIGINT) END AS port,
         |  string_split(host, '.') AS labels
         |  FROM parts),
         |dom AS (SELECT *,
         |  CASE WHEN len(labels) >= 2
         |       AND array_to_string(labels[-2:], '.') IN ('co.uk','ac.uk','gov.uk','org.uk','me.uk','net.uk','com.au','net.au','org.au','co.jp','ne.jp','or.jp','com.br','com.cn','com.tw','co.in','co.kr','com.mx','co.nz','co.za','com.sg','com.ar','com.tr','co.id')
         |       AND len(labels) >= 3 THEN 3 ELSE 2 END AS take
         |  FROM typed)
         |SELECT event_id, url, scheme, host, port, path, query,
         |  regexp_extract(query, '(?:^|&)uid=([^&]*)', 1) AS uid,
         |  fragment,
         |  CASE WHEN len(labels) <= 2 THEN host
         |       ELSE array_to_string(labels[(len(labels)-take+1):len(labels)], '.') END AS reg_domain,
         |  CASE WHEN scheme = '' THEN url ELSE
         |    scheme || '://' || host ||
         |    (CASE WHEN port IS NULL OR (scheme = 'http' AND port = 80)
         |               OR (scheme = 'https' AND port = 443) THEN ''
         |          ELSE ':' || CAST(port AS VARCHAR) END) ||
         |    (CASE WHEN path = '' THEN '/' ELSE path END) ||
         |    (CASE WHEN query = '' THEN '' ELSE '?' || query END)
         |  END AS canonical
         |FROM dom""".stripMargin,

    // mirror of Rank.bm25's exact IEEE expression tree: every constant is
    // binary-exact (k1=1.5, b=0.75, k1+1=2.5, 1-b=0.25) and only + * / is
    // used, so scores hash-match bit-for-bit (odds-form idf; see Rank docs)
    "q_bm25" ->
      s"""WITH base AS (
         |  SELECT doc_id, COALESCE(CAST(len($NormToks) AS BIGINT), 0) AS dl,
         |         COALESCE($NormToks, []) AS w
         |  FROM documents),
         |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
         |                 CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
         |          FROM base),
         |posting AS (
         |  SELECT term, doc_id, CAST(len(list_filter(w, t -> t = term)) AS BIGINT) AS tf, dl
         |  FROM base, (SELECT unnest(['merge', 'vector', 'window']) AS term) terms),
         |dfs AS (SELECT term, CAST(sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df
         |        FROM posting GROUP BY 1),
         |scored AS (
         |  SELECT p.term, p.doc_id, p.tf, p.dl,
         |    (((SELECT n FROM stats) - d.df + 0.5) / (d.df + 0.5)) *
         |    ((CAST(p.tf AS DOUBLE) * 2.5) /
         |     (CAST(p.tf AS DOUBLE) + 1.5 * (0.25 + (0.75 * CAST(p.dl AS DOUBLE)) / (SELECT avgdl FROM stats)))) AS score
         |  FROM posting p JOIN dfs d USING (term) WHERE p.tf > 0)
         |SELECT term, doc_id, tf, dl, score,
         |  CAST(row_number() OVER (PARTITION BY term ORDER BY score DESC, doc_id) AS BIGINT) AS rank
         |FROM scored QUALIFY rank <= 10""".stripMargin,

    // same integer arithmetic as Rank.pageRank: DuckDB `//` floors and Spark
    // `div` truncates, identical on the all-positive masses here; the BIGINT
    // sum is cast back from DuckDB's HUGEINT to match Spark's LongType
    "q_pagerank" -> {
      val iters = (1 to 5).map { i =>
        s"""c$i AS (SELECT e2.dst AS id, CAST(sum(((p.mass * 17) // 20) // e2.outdeg) AS BIGINT) AS s
           |  FROM e2 JOIN pr${i - 1} p ON e2.src = p.id GROUP BY 1),
           |pr$i AS (SELECT n.id, 150000 + COALESCE(c$i.s, 0) AS mass
           |  FROM allnodes n LEFT JOIN c$i ON n.id = c$i.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ids),
         |eraw AS (
         |  SELECT id AS src, (id + 1) % n AS dst FROM ids, nn
         |  UNION ALL SELECT id, (id * 7 + 3) % n FROM ids, nn
         |  UNION ALL SELECT id, (id * 13 + 5) % n FROM ids, nn),
         |e AS (SELECT DISTINCT src, dst FROM eraw WHERE src <> dst),
         |allnodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |od AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
         |e2 AS (SELECT e.src, e.dst, od.outdeg FROM e JOIN od USING (src)),
         |pr0 AS (SELECT id, CAST(1000000 AS BIGINT) AS mass FROM allnodes),
         |$iters
         |SELECT id AS doc_id, mass FROM pr5""".stripMargin
    },

    // twin of q_recrawl: identical integer-epoch arithmetic — epoch_us //
    // 1e6 FLOORS like Spark's unix_timestamp (epoch() would round the
    // fractional seconds through the double→BIGINT cast)
    "q_recrawl" ->
      """WITH a AS (SELECT 'u' || CAST(user_id AS VARCHAR) AS url,
        |    CAST(count(*) AS BIGINT) AS n_changes,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes,
        |    CAST(epoch_us(min(ts)) // 1000000 AS BIGINT) AS first_s,
        |    CAST(epoch_us(max(ts)) // 1000000 AS BIGINT) AS last_s
        |  FROM events GROUP BY 1)
        |SELECT url, n_changes, n_deletes, first_s, last_s,
        |  (last_s - first_s) // greatest(n_changes - 1, 1) AS mean_interval_s,
        |  last_s + (last_s - first_s) // greatest(n_changes - 1, 1) AS next_due_s
        |FROM a""".stripMargin,

    // twin of q_wet: the record string and every parsed field re-derived
    // directly (print ∘ frame ∘ parse must equal the derivation);
    // content_length is octet length per ISO 28500
    "q_wet" ->
      """WITH b AS (SELECT doc_id, text,
        |    'https://' || source || '/p/' || CAST(doc_id AS VARCHAR) AS uri,
        |    '<urn:uuid:doc-' || CAST(doc_id AS VARCHAR) || '>' AS rid
        |  FROM documents)
        |SELECT doc_id,
        |  'WARC/1.0' || chr(13) || chr(10) ||
        |  'WARC-Type: conversion' || chr(13) || chr(10) ||
        |  'WARC-Target-URI: ' || uri || chr(13) || chr(10) ||
        |  'WARC-Date: 2026-01-15T00:00:00Z' || chr(13) || chr(10) ||
        |  'WARC-Record-ID: ' || rid || chr(13) || chr(10) ||
        |  'Content-Type: text/plain' || chr(13) || chr(10) ||
        |  'Content-Length: ' || CAST(strlen(text) AS VARCHAR) ||
        |  chr(13) || chr(10) || chr(13) || chr(10) || text AS wet,
        |  'conversion' AS warc_type,
        |  uri AS target_uri,
        |  '2026-01-15T00:00:00Z' AS warc_date,
        |  CAST(strlen(text) AS BIGINT) AS content_length,
        |  text AS body
        |FROM b""".stripMargin,

    // twin of Rank.hits(iterations=3) on the q_pagerank edge construction:
    // per half-step an integer sum then a truncating max-based rescale
    "q_hits" -> {
      val rounds = (1 to 3).map { i =>
        s"""ar$i AS (SELECT e.dst AS id, CAST(sum(h.m) AS BIGINT) AS s
           |  FROM e JOIN h${i - 1} h ON e.src = h.id GROUP BY 1),
           |an$i AS (SELECT n.id, CAST(coalesce(ar$i.s, 0) AS BIGINT) AS s
           |  FROM allnodes n LEFT JOIN ar$i USING (id)),
           |a$i AS (SELECT id, CAST(s // (SELECT greatest(max(s) // 1000000, 1) FROM an$i) AS BIGINT) AS m FROM an$i),
           |hr$i AS (SELECT e.src AS id, CAST(sum(a.m) AS BIGINT) AS s
           |  FROM e JOIN a$i a ON e.dst = a.id GROUP BY 1),
           |hn$i AS (SELECT n.id, CAST(coalesce(hr$i.s, 0) AS BIGINT) AS s
           |  FROM allnodes n LEFT JOIN hr$i USING (id)),
           |h$i AS (SELECT id, CAST(s // (SELECT greatest(max(s) // 1000000, 1) FROM hn$i) AS BIGINT) AS m FROM hn$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ids),
         |eraw AS (
         |  SELECT id AS src, (id + 1) % n AS dst FROM ids, nn
         |  UNION ALL SELECT id, (id * 7 + 3) % n FROM ids, nn
         |  UNION ALL SELECT id, (id * 13 + 5) % n FROM ids, nn),
         |e AS (SELECT DISTINCT src, dst FROM eraw WHERE src <> dst),
         |allnodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         |h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS m FROM allnodes),
         |$rounds
         |SELECT n.id AS doc_id, h3.m AS hub, a3.m AS authority
         |FROM allnodes n JOIN h3 ON n.id = h3.id JOIN a3 ON n.id = a3.id""".stripMargin
    },

    "q_repetition" ->
      s"""WITH toks AS (SELECT doc_id, coalesce($NormToks, []) AS w FROM documents),
         |base AS (SELECT doc_id, len(w) AS ntok,
         |  CASE WHEN len(w) >= 2 THEN list_transform(generate_series(1, len(w)-1), i -> array_to_string(w[i:i+1], ' ')) ELSE [] END AS w2,
         |  CASE WHEN len(w) >= 3 THEN list_transform(generate_series(1, len(w)-2), i -> array_to_string(w[i:i+2], ' ')) ELSE [] END AS w3
         |  FROM toks),
         |c2 AS (SELECT doc_id, g, count(*) AS c FROM (SELECT doc_id, unnest(w2) AS g FROM base) GROUP BY doc_id, g),
         |s2 AS (SELECT doc_id, max(c) AS maxc FROM c2 GROUP BY doc_id),
         |c3 AS (SELECT doc_id, g, count(*) AS c FROM (SELECT doc_id, unnest(w3) AS g FROM base) GROUP BY doc_id, g),
         |s3 AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dupw, sum(c) AS nw FROM c3 GROUP BY doc_id),
         |lc AS (SELECT doc_id, l, count(*) AS c FROM (
         |  SELECT doc_id, unnest(string_split(concat_ws(chr(10), source, lang, source, lang, CAST(doc_id AS VARCHAR)), chr(10))) AS l
         |  FROM documents) GROUP BY doc_id, l),
         |ls AS (SELECT doc_id, sum(c) AS total, count(*) AS dist,
         |  sum((c-1)*length(l)) AS dupchars, sum(c*length(l)) AS totchars FROM lc GROUP BY doc_id)
         |SELECT b.doc_id,
         |  CASE WHEN b.ntok = 0 THEN 0.0 ELSE least(CAST(coalesce(s2.maxc, 0) * 2 AS DOUBLE) / CAST(b.ntok AS DOUBLE), 1.0) END AS top2_frac,
         |  CASE WHEN coalesce(s3.nw, 0) = 0 THEN 0.0 ELSE CAST(s3.dupw AS DOUBLE) / CAST(s3.nw AS DOUBLE) END AS dup3_frac,
         |  CASE WHEN ls.total = 0 THEN 0.0 ELSE CAST(ls.total - ls.dist AS DOUBLE) / CAST(ls.total AS DOUBLE) END AS dup_line_frac,
         |  CASE WHEN ls.totchars = 0 THEN 0.0 ELSE CAST(ls.dupchars AS DOUBLE) / CAST(ls.totchars AS DOUBLE) END AS dup_line_char_frac
         |FROM base b LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id) JOIN ls USING (doc_id)""".stripMargin,

    // perceptron replay: w0=0 ⇒ round 1's gradient is Σ y·c over ALL docs
    // (every doc has margin 0, hence misclassified); round 2 restricts to
    // docs still misclassified under w1=g1. Scores are exact integer sums.
    "q_classifier" ->
      s"""WITH pg AS (SELECT doc_id,
         |    CASE WHEN doc_id % 2 = 0 THEN text || ' goodmark goodmark' ELSE text || ' badmark' END AS text,
         |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE -1 END AS y
         |  FROM documents),
         |toks AS (SELECT doc_id, y, coalesce($NormToks, []) AS w FROM pg),
         |cnt AS (SELECT doc_id, y, ('0x' || substr(md5(t), 1, 15))::BIGINT % 64 AS b, count(*) AS c
         |  FROM (SELECT doc_id, y, unnest(w) AS t FROM toks) GROUP BY 1, 2, 3),
         |g1 AS (SELECT b, CAST(sum(y * c) AS BIGINT) AS w FROM cnt GROUP BY b),
         |s1 AS (SELECT c.doc_id, c.y, CAST(sum(c.c * coalesce(g1.w, 0)) AS BIGINT) AS s
         |  FROM cnt c LEFT JOIN g1 USING (b) GROUP BY 1, 2),
         |g2 AS (SELECT b, CAST(sum(y * c) AS BIGINT) AS g FROM cnt
         |  WHERE doc_id IN (SELECT doc_id FROM s1 WHERE y * s <= 0) GROUP BY b),
         |w2 AS (SELECT coalesce(g1.b, g2.b) AS b, coalesce(g1.w, 0) + coalesce(g2.g, 0) AS w
         |  FROM g1 FULL OUTER JOIN g2 ON g1.b = g2.b),
         |s2 AS (SELECT c.doc_id, CAST(sum(c.c * coalesce(w2.w, 0)) AS BIGINT) AS s
         |  FROM cnt c LEFT JOIN w2 ON c.b = w2.b GROUP BY 1)
         |SELECT p.doc_id, CAST(p.y AS BIGINT) AS label,
         |  coalesce(s2.s, 0) AS score,
         |  CAST(CASE WHEN coalesce(s2.s, 0) > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred
         |FROM pg p LEFT JOIN s2 ON p.doc_id = s2.doc_id""".stripMargin,

    "q_c4_filter" ->
      s"""WITH pg AS (SELECT doc_id, $PageSql AS page FROM documents),
         |ln AS (SELECT doc_id, page, string_split(page, chr(10)) AS lines FROM pg),
         |k AS (SELECT doc_id, page, lines,
         |  list_filter(lines, l -> regexp_matches(l, '[.!?"]$$')
         |    AND len(list_filter(regexp_split_to_array(trim(l), '\\s+'), w -> length(w) > 0)) >= 5
         |    AND NOT contains(lower(l), 'javascript')) AS kept
         |  FROM ln)
         |SELECT doc_id, array_to_string(kept, chr(10)) AS clean_text,
         |  CAST(len(kept) AS BIGINT) AS kept_lines,
         |  CAST(len(lines) AS BIGINT) AS total_lines,
         |  (len(kept) >= 3 AND NOT contains(lower(page), 'lorem ipsum')
         |    AND NOT contains(page, '{')) AS keep
         |FROM k""".stripMargin,

    "q_gopher_filter" -> {
      val Req = "['the','be','to','of','and','that','have','with']"
      s"""WITH pg AS (SELECT doc_id, $PageSql AS text FROM documents),
         |toks AS (SELECT doc_id, text, coalesce($NormToks, []) AS w,
         |  string_split(text, chr(10)) AS lines FROM pg),
         |sig AS (SELECT doc_id,
         |  CAST(len(w) AS BIGINT) AS n_words,
         |  CASE WHEN len(w) = 0 THEN 0.0
         |    ELSE CAST(list_reduce(list_prepend(0, list_transform(w, x -> length(x))), (a, b) -> a + b) AS DOUBLE) / CAST(len(w) AS DOUBLE) END AS mean_word_len,
         |  CASE WHEN len(w) = 0 THEN 0.0
         |    ELSE CAST(len(list_filter(w, x -> contains(x, '#'))) AS DOUBLE) / CAST(len(w) AS DOUBLE) END AS hash_ratio,
         |  CASE WHEN len(w) = 0 THEN 0.0
         |    ELSE CAST(len(list_filter(w, x -> contains(x, '...') OR contains(x, '…'))) AS DOUBLE) / CAST(len(w) AS DOUBLE) END AS ellipsis_ratio,
         |  CASE WHEN len(lines) = 0 THEN 0.0
         |    ELSE CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '^([-*•])'))) AS DOUBLE) / CAST(len(lines) AS DOUBLE) END AS bullet_frac,
         |  CASE WHEN len(lines) = 0 THEN 0.0
         |    ELSE CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$$'))) AS DOUBLE) / CAST(len(lines) AS DOUBLE) END AS ellipsis_frac,
         |  CASE WHEN len(w) = 0 THEN 0.0
         |    ELSE CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / CAST(len(w) AS DOUBLE) END AS alpha_frac,
         |  CAST(len(list_filter($Req, s -> list_contains(w, s))) AS BIGINT) AS stop_hits
         |  FROM toks)
         |SELECT doc_id, n_words, mean_word_len, hash_ratio, ellipsis_ratio,
         |  bullet_frac, ellipsis_frac, alpha_frac, stop_hits,
         |  (n_words >= 50 AND n_words <= 100000
         |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |    AND hash_ratio <= 0.1 AND ellipsis_ratio <= 0.1
         |    AND bullet_frac <= 0.9
         |    AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
         |    AND stop_hits >= 2) AS keep
         |FROM sig""".stripMargin
    },

    "q_window_dup" ->
      s"""WITH toks AS (SELECT doc_id, $NormToks AS w FROM documents),
         |wins AS (SELECT doc_id, CASE WHEN len(w) >= 5
         |  THEN list_distinct(list_transform(generate_series(1, len(w)-4),
         |       i -> ('0x' || substr(md5(array_to_string(w[i:i+4], ' ')), 1, 15))::BIGINT))
         |  ELSE [] END AS ws FROM toks),
         |ex AS (SELECT doc_id, unnest(ws) AS wh FROM wins),
         |ok AS (SELECT wh FROM ex GROUP BY wh HAVING count(*) <= 50),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM ex a JOIN ex b
         |  ON a.wh = b.wh AND a.doc_id < b.doc_id
         |  WHERE a.wh IN (SELECT wh FROM ok))
         |SELECT id_a, id_b, count(*) AS shared_windows FROM p GROUP BY id_a, id_b""".stripMargin,

    // twin of q_surt: host/path/query via the q_urlfns regexes, then the
    // identical reverse-join / param-sort construction
    "q_surt" ->
      s"""WITH u AS (SELECT event_id, $UrlSql AS url FROM events),
         |p AS (SELECT event_id, url,
         |  regexp_replace(lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)', 1)), '^www\\.', '') AS host,
         |  lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
         |  regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]*:([0-9]+)', 1) AS port,
         |  lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1)) AS path,
         |  lower(regexp_extract(url, '^[^#]*?\\?([^#]*)', 1)) AS q
         |  FROM u)
         |SELECT event_id, url,
         |  array_to_string(list_reverse(string_split(host, '.')), ',') ||
         |  (CASE WHEN port = ''
         |        OR (scheme = 'http' AND TRY_CAST(port AS BIGINT) = 80)
         |        OR (scheme = 'https' AND TRY_CAST(port AS BIGINT) = 443)
         |     THEN '' ELSE ':' || CAST(TRY_CAST(port AS BIGINT) AS VARCHAR) END) || ')' ||
         |  (CASE WHEN path = '' THEN '/' ELSE path END) ||
         |  (CASE WHEN q = '' THEN '' ELSE '?' || array_to_string(list_sort(string_split(q, '&')), '&') END)
         |  AS urlkey
         |FROM p""".stripMargin,

    // twin of q_cdx: the line string and every parsed field re-derived from
    // the documents table directly (print∘parse must equal the derivation)
    "q_cdx" ->
      """WITH b AS (SELECT doc_id, source, text,
        |    'https://' || source || '/Docs/' || CAST(doc_id AS VARCHAR) || '?b=2&a=1' AS url,
        |    '202601' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
        |      lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0') || '3015' AS ts14,
        |    CAST(200 + doc_id % 2 AS INT) AS status,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS digest,
        |    CAST(length(text) AS BIGINT) AS len,
        |    CAST(doc_id * 1024 AS BIGINT) AS off,
        |    'crawl-' || CAST(doc_id % 10 AS VARCHAR) || '.warc.gz' AS filename
        |  FROM documents),
        |k AS (SELECT *,
        |    array_to_string(list_reverse(string_split(
        |      regexp_replace(lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)', 1)), '^www\.', ''), '.')), ',')
        |    || ')' || lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1))
        |    || '?' || array_to_string(list_sort(string_split(lower(regexp_extract(url, '^[^#]*?\?([^#]*)', 1)), '&')), '&')
        |    AS urlkey
        |  FROM b)
        |SELECT doc_id,
        |  urlkey || ' ' || ts14 || ' {"url": "' || url ||
        |    '", "mime": "text/html", "status": "' || CAST(status AS VARCHAR) ||
        |    '", "digest": "' || digest ||
        |    '", "length": "' || CAST(len AS VARCHAR) ||
        |    '", "offset": "' || CAST(off AS VARCHAR) ||
        |    '", "filename": "' || filename || '"}' AS line,
        |  urlkey, strptime(ts14, '%Y%m%d%H%M%S') AS ts, url, status,
        |  'text/html' AS mime, digest, len AS length, off AS offset, filename
        |FROM k""".stripMargin,

    // twin of Bpe.train(numMerges=6): the same merge loop unrolled — per
    // iteration, adjacent-symbol pair counts weighted by word freq, argmax
    // with (count desc, pair asc) tiebreak, then a one-pass literal replace
    // on the space-guarded segmentation string (replace() scans left-to-
    // right non-overlapping in both engines)
    "q_bpe" -> {
      val iters = (1 to 6).map { i =>
        s"""p$i AS (SELECT unnest(list_transform(generate_series(1, len(sym) - 1),
           |      j -> sym[j] || ' ' || sym[j+1])) AS pair, freq
           |  FROM (SELECT string_split(trim(seg), ' ') AS sym, freq FROM s${i - 1})),
           |c$i AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS c FROM p$i GROUP BY 1),
           |b$i AS (SELECT CAST($i AS BIGINT) AS rank, pair, c FROM c$i
           |        ORDER BY c DESC, pair LIMIT 1),
           |s$i AS (SELECT freq, replace(seg,
           |    ' ' || (SELECT pair FROM b$i) || ' ',
           |    ' ' || replace((SELECT pair FROM b$i), ' ', '') || ' ') AS seg
           |  FROM s${i - 1})""".stripMargin
      }.mkString(",\n")
      s"""WITH t AS (SELECT unnest($NormToks) AS word FROM documents),
         |w AS (SELECT word, count(*) AS freq FROM t GROUP BY 1),
         |s0 AS (SELECT freq,
         |    ' ' || array_to_string(regexp_extract_all(word, '.'), ' ') || ' ' AS seg
         |  FROM w),
         |$iters
         |SELECT rank, split_part(pair, ' ', 1) AS lhs, split_part(pair, ' ', 2) AS rhs,
         |  c AS pair_count
         |FROM (SELECT * FROM b1 UNION ALL SELECT * FROM b2 UNION ALL SELECT * FROM b3
         |  UNION ALL SELECT * FROM b4 UNION ALL SELECT * FROM b5
         |  UNION ALL SELECT * FROM b6)""".stripMargin
    },

    "q_python" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |  l_quantity * l_extendedprice AS total
        |FROM lineitem WHERE l_orderkey % 10 = 0
        |  AND l_quantity * l_extendedprice >= 20000.0""".stripMargin,

    // twin of Dedup.decontaminate(n=3, minHits=2), benchmark = doc_id%25==0
    "q_decontaminate" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)),
        |      i -> array_to_string(w[i:i+2], ' '))) AS sh
        |  FROM (SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
        |    FROM documents)
        |), b AS (SELECT DISTINCT unnest(sh) AS shingle FROM d WHERE doc_id % 25 = 0),
        |e AS (SELECT doc_id, unnest(sh) AS shingle FROM d)
        |SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_hits,
        |  count(*) >= 2 AS contaminated
        |FROM e JOIN b USING (shingle) GROUP BY 1""".stripMargin,

    // twin of Dsir.score(n=2, buckets=512), target = doc_id%25==0; integer
    // masses + one exactly-rounded division → bit-identical scores
    "q_dsir" ->
      s"""WITH toks AS (SELECT doc_id, coalesce($NormToks, []) AS w FROM documents),
         |g AS (SELECT doc_id,
         |    CASE WHEN len(w) >= 2 THEN list_transform(generate_series(1, len(w)-1),
         |      i -> array_to_string(w[i:i+1], ' ')) ELSE [] END AS grams
         |  FROM toks),
         |e AS (SELECT doc_id,
         |    ('0x' || substr(md5(unnest(grams)), 1, 15))::BIGINT % 512 AS bucket
         |  FROM g),
         |tc AS (SELECT bucket, count(*) AS c FROM e WHERE doc_id % 25 = 0 GROUP BY 1),
         |bc AS (SELECT bucket, count(*) AS c FROM e GROUP BY 1),
         |s AS (SELECT e.doc_id,
         |    count(*) AS n_grams,
         |    sum(coalesce(tc.c, 0) + 1) AS t_mass,
         |    sum(coalesce(bc.c, 0) + 1) AS b_mass
         |  FROM e LEFT JOIN tc USING (bucket) LEFT JOIN bc USING (bucket)
         |  GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams,
         |  CAST(coalesce(s.t_mass, 0) AS BIGINT) AS t_mass,
         |  CAST(coalesce(s.b_mass, 0) AS BIGINT) AS b_mass,
         |  CASE WHEN s.n_grams > 0
         |    THEN CAST(s.t_mass AS DOUBLE) / CAST(s.b_mass AS DOUBLE) END AS score
         |FROM documents d LEFT JOIN s USING (doc_id)""".stripMargin,

    // twin of q_mixture: per (lang, source) doc/token counts + token share
    "q_mixture" ->
      """WITH n AS (SELECT lang, source,
        |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |      t -> length(t) > 0)) AS BIGINT) AS ntok
        |  FROM documents)
        |SELECT lang, source, CAST(count(*) AS BIGINT) AS docs,
        |  CAST(sum(ntok) AS BIGINT) AS tokens,
        |  CAST(sum(ntok) AS DOUBLE) / CAST(sum(sum(ntok)) OVER () AS DOUBLE) AS token_share
        |FROM n GROUP BY 1, 2""".stripMargin,

    // twin of Pii: identical regex chain (Java regex and RE2 agree on this
    // syntax subset), identical planted PII, identical redaction order
    "q_pii" -> {
      val planted = "text || ' Contact user' || CAST(doc_id AS VARCHAR)" +
        " || '@example.org or +1 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')" +
        " || '-1234, host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.7, SSN 123-45-6789.'"
      s"""WITH p AS (SELECT doc_id, $planted AS t FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '${Pii.emailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(t, '${Pii.ipv4Re}')) AS BIGINT) AS n_ips,
         |  CAST(len(regexp_extract_all(t, '${Pii.ssnRe}')) AS BIGINT) AS n_ssn,
         |  CAST(len(regexp_extract_all(t, '${Pii.phoneRe}')) AS BIGINT) AS n_phones,
         |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
         |    '${Pii.emailRe}', '<EMAIL>', 'g'),
         |    '${Pii.ssnRe}', '<SSN>', 'g'),
         |    '${Pii.ipv4Re}', '<IP>', 'g'),
         |    '${Pii.phoneRe}', '<PHONE>', 'g') AS redacted
         |FROM p""".stripMargin
    },

    // twin of Dedup.dedupLines(maxFreq=1) over sentence-split + planted footer
    "q_dedup_lines" ->
      """WITH src AS (SELECT doc_id,
        |    replace(text, '. ', chr(10)) || chr(10) || 'Subscribe to our newsletter today!' AS t
        |  FROM documents),
        |l AS (SELECT doc_id, unnest(string_split(t, chr(10))) AS ln,
        |        generate_subscripts(string_split(t, chr(10)), 1) AS i FROM src),
        |f AS (SELECT ln, count(*) AS freq FROM l GROUP BY 1)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN freq > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  coalesce(array_to_string(list(ln ORDER BY i) FILTER (WHERE freq <= 1), chr(10)), '') AS clean_text
        |FROM l JOIN f USING (ln)
        |GROUP BY doc_id""".stripMargin,

    // twin of Dedup.duplicatedSpans(k=5, minFreq=2) with the planted tail:
    // gaps-and-islands over corpus-duplicated window positions
    "q_dup_spans" ->
      s"""WITH $SpanDupCtes,
         |isl AS (SELECT doc_id, pos,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS g
         |  FROM dup)
         |SELECT doc_id,
         |  CAST(min(pos) AS BIGINT) AS span_start,
         |  CAST(max(pos) + 5 AS BIGINT) AS span_end,
         |  CAST(count(*) AS BIGINT) AS n_windows
         |FROM isl GROUP BY doc_id, g""".stripMargin,

    // twin of Dedup.removeDuplicatedSpans: covered token positions are the
    // duplicated windows re-expanded; survivors rejoin in original order
    "q_span_clean" ->
      s"""WITH $SpanDupCtes,
         |covered AS (SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + 4)) AS tp FROM dup),
         |tokpos AS (SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) - 1 AS tp FROM toks),
         |kept AS (SELECT t.doc_id, t.tok, t.tp FROM tokpos t
         |  LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.tp = c.tp
         |  WHERE c.tp IS NULL),
         |agg AS (SELECT doc_id, count(*) AS kept_n,
         |    array_to_string(list(tok ORDER BY tp), ' ') AS clean_text
         |  FROM kept GROUP BY doc_id)
         |SELECT s.doc_id,
         |  CAST(len(s.w) AS BIGINT) AS n_tokens,
         |  CAST(len(s.w) - coalesce(a.kept_n, 0) AS BIGINT) AS n_removed,
         |  coalesce(a.clean_text, '') AS clean_text
         |FROM toks s LEFT JOIN agg a USING (doc_id)""".stripMargin,

    // twin of Rank.lmAvgProb(buckets=512): hashed bigram/unigram counts,
    // add-one smoothing, left-fold double sum in token order (bit-identical)
    "q_lm_score" ->
      s"""WITH toks AS (SELECT doc_id, coalesce($NormToks, []) AS w FROM documents),
         |g AS (SELECT doc_id, w,
         |    CASE WHEN len(w) >= 2 THEN list_transform(generate_series(1, len(w) - 1),
         |      i -> array_to_string(w[i:i+1], ' ')) ELSE [] END AS g2
         |  FROM toks),
         |eb AS (SELECT ('0x' || substr(md5(unnest(g2)), 1, 15))::BIGINT % 512 AS b FROM g),
         |bc2 AS (SELECT b, count(*) AS c FROM eb GROUP BY 1),
         |eu AS (SELECT ('0x' || substr(md5(unnest(w)), 1, 15))::BIGINT % 512 AS b FROM toks),
         |bc1 AS (SELECT b, count(*) AS c FROM eu GROUP BY 1),
         |pg AS (SELECT doc_id, unnest(g2) AS gram, unnest(w[1:len(g2)]) AS ctx,
         |    generate_subscripts(g2, 1) AS i FROM g),
         |p AS (SELECT pg.doc_id, pg.i,
         |    CAST(coalesce(b2.c, 0) + 1 AS DOUBLE) / CAST(coalesce(b1.c, 0) + 512 AS DOUBLE) AS prob
         |  FROM pg
         |  LEFT JOIN bc2 b2 ON b2.b = ('0x' || substr(md5(pg.gram), 1, 15))::BIGINT % 512
         |  LEFT JOIN bc1 b1 ON b1.b = ('0x' || substr(md5(pg.ctx), 1, 15))::BIGINT % 512),
         |s AS (SELECT doc_id, count(*) AS n_grams,
         |    list_reduce(list_prepend(0.0, list(prob ORDER BY i)), (a, b) -> a + b) AS sum_prob
         |  FROM p GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams,
         |  coalesce(s.sum_prob, 0.0) AS sum_prob,
         |  CASE WHEN s.n_grams > 0 THEN s.sum_prob / CAST(s.n_grams AS DOUBLE) END AS avg_prob
         |FROM documents d LEFT JOIN s USING (doc_id)""".stripMargin,

    // twin of Pipe.shuffle_(seed=7): seeded-hash global permutation
    "q_shuffle" ->
      """SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || chr(1) || '7'), 1, 15))::BIGINT,
        |    doc_id) - 1 AS BIGINT) AS shuffle_pos
        |FROM documents""".stripMargin,

    // twin of Pipe.splitHash_(0.5/0.25/0.25, seed=42): cumulative thresholds
    // are exact binary doubles, so the CASE literals match bit-for-bit
    "q_split" ->
      """SELECT doc_id, lang,
        |  CASE WHEN u < 0.5 THEN 'train' WHEN u < 0.75 THEN 'valid' ELSE 'test' END AS split
        |FROM (SELECT doc_id, lang,
        |  (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || chr(1) || '42'), 1, 15))::BIGINT
        |    % 1000000) / 1000000.0 AS u
        |  FROM documents)""".stripMargin,

    // twin of Dedup.dedupIncremental(bands=16, rows=2, threshold=0.5):
    // existing = even docs, incoming = odd ∪ id-shifted clones of the evens;
    // same 32-component minhash family and band-slice equality as
    // q_minhash_pairs, restricted to new×old pairs
    "q_dedup_incremental" ->
      s"""WITH d AS (
         |  SELECT doc_id, ${MLQueries.ShinglesSql} AS sh
         |  FROM (SELECT doc_id, ${MLQueries.NormWords} AS w FROM documents)
         |), h AS (
         |  SELECT doc_id, list_transform(sh, s -> ${MLQueries.md5h60("s")}) AS hs FROM d
         |), sig AS (
         |  SELECT doc_id, [${MLQueries.minhashComponentsSql(32)}] AS sig FROM h
         |), old AS (SELECT doc_id, sig FROM sig WHERE doc_id % 2 = 0),
         |nw AS (SELECT doc_id, sig FROM sig WHERE doc_id % 2 = 1
         |       UNION ALL SELECT doc_id + 1000000, sig FROM sig WHERE doc_id % 2 = 0),
         |bo AS (SELECT doc_id, sig, b, sig[2*b+1 : 2*b+2] AS key
         |  FROM old CROSS JOIN generate_series(0, 15) AS t(b)),
         |bn AS (SELECT doc_id, sig, b, sig[2*b+1 : 2*b+2] AS key
         |  FROM nw CROSS JOIN generate_series(0, 15) AS t(b)),
         |cand AS (SELECT DISTINCT n.doc_id AS nid, o.doc_id AS oid,
         |    n.sig AS nsig, o.sig AS osig
         |  FROM bn n JOIN bo o ON n.b = o.b AND n.key = o.key),
         |est AS (SELECT nid, oid,
         |    CAST(len(list_filter(generate_series(1, 32), i -> nsig[i] = osig[i])) AS DOUBLE) / 32.0 AS est
         |  FROM cand),
         |best AS (SELECT nid, min(oid) AS noid FROM est WHERE est >= 0.5 GROUP BY nid),
         |bestv AS (SELECT b.nid, b.noid, e.est FROM best b
         |  JOIN est e ON e.nid = b.nid AND e.oid = b.noid),
         |fps AS (SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
         |  FROM documents),
         |oldfp AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 2 = 0),
         |newfp AS (SELECT doc_id, fp FROM fps WHERE doc_id % 2 = 1
         |          UNION ALL SELECT doc_id + 1000000, fp FROM fps WHERE doc_id % 2 = 0)
         |SELECT n.doc_id,
         |  (n.fp IN (SELECT fp FROM oldfp)) AS is_exact,
         |  v.noid AS near_id, v.est AS est_jaccard
         |FROM newfp n LEFT JOIN bestv v ON v.nid = n.doc_id""".stripMargin,

    // twin of Pipe.sampleStratified_(rates en/de/zh, default 0.25, seed 42)
    "q_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || chr(1) || '42'), 1, 15))::BIGINT
        |    % 1000000) / 1000000.0
        |  < CASE lang WHEN 'en' THEN 0.9 WHEN 'de' THEN 0.5 WHEN 'zh' THEN 0.1
        |    ELSE 0.25 END""".stripMargin)
}
