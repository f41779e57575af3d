package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.formats.{Bitz, Cef, Codec, Feather, Grok, JsonInfer, JsonStreams, Leef, Robots, Sitemap, Syslog5424, Warc, Zeek}

/** Driver-checked query catalog, part 4: the widened parser surface —
  * grok with the real pattern library, syslog RFC 5424 (incl.
  * STRUCTURED-DATA), CEF, LEEF, zeek TSV, and JSON schema inference /
  * selector routing. Same contract as [[FormatQueries]]: each query
  * synthesizes its raw input deterministically from the driver tables, parses
  * it back with the engine's parser, and the DuckDB oracle runs the
  * equivalent extraction on the identically-synthesized string.
  */
object ParserQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // ------------------------------------------------------------------- grok

  /** Access-log grok expression compiled against the built-in library (all
    * referenced patterns are RE2-safe, so DuckDB can run the SAME compiled
    * regex with the SAME group indices).
    */
  val AccessGrok: Grok.Compiled = Grok.compile(
    """%{IPV4:client_ip} %{USER:ident} %{USER:auth} \[%{HTTPDATE:ts_str}\] "%{WORD:method} %{URIPATH:path} HTTP/%{NUMBER:httpversion}" %{NONNEGINT:status:int} %{NONNEGINT:bytes:int}""")

  private def accessLine: Column =
    concat(
      lit("10."), pmod(col("user_id"), lit(256)).cast("string"), lit(".0.1 frank alice ["),
      date_format(col("ts"), "dd/MMM/yyyy:HH:mm:ss"), lit(" +0000] \"GET /p/"),
      col("event_type"), lit(" HTTP/1.1\" "),
      (lit(200) + pmod(col("event_id"), lit(3)) * 100).cast("string"), lit(" "),
      pmod(col("event_id"), lit(5000)).cast("string"))

  // ---------------------------------------------------------- syslog RFC5424

  private def syslog5424Line: Column =
    concat(
      lit("<"), (lit(8) + pmod(col("event_id"), lit(184))).cast("string"), lit(">1 "),
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"),
      lit(" host"), pmod(col("user_id"), lit(50)).cast("string"),
      lit(" app"), pmod(col("event_id"), lit(7)).cast("string"),
      lit(" "), pmod(col("event_id"), lit(997)).cast("string"),
      lit(" MSG"), pmod(col("event_id"), lit(13)).cast("string"),
      lit(" [meta@1 type=\""), col("event_type"),
      lit("\" uid=\""), col("user_id").cast("string"),
      lit("\"][timing@2 ms=\""), pmod(col("event_id"), lit(900)).cast("string"),
      lit("\"] event "), col("event_type"), lit(" fired"))

  // --------------------------------------------------------------- CEF / LEEF

  private def cefLine: Column =
    concat(
      lit("CEF:0|graft|engine|1.0|sig-"), pmod(col("event_id"), lit(40)).cast("string"),
      lit("|"), col("event_type"), lit("|"), pmod(col("event_id"), lit(10)).cast("string"),
      lit("|src=10."), pmod(col("user_id"), lit(256)).cast("string"),
      lit(".0.1 dpt="), pmod(col("event_id"), lit(65536)).cast("string"),
      lit(" act="), col("event_type"))

  private def leefLine: Column =
    concat(
      lit("LEEF:1.0|graft|engine|1.0|ev-"), pmod(col("event_id"), lit(40)).cast("string"),
      lit("|usrName=u"), col("user_id").cast("string"),
      lit("\tsev="), pmod(col("event_id"), lit(10)).cast("string"),
      lit("\tcat="), col("event_type"))

  // ----------------------------------------------------------------- zeek TSV

  /** A zeek-ish conn log synthesized from events: directive header + one
    * data row per event (tab-separated), exercising time/count/bool/set
    * typed parsing plus unset (`-`) and `(empty)` handling.
    */
  private def zeekLines(s: SparkSession, d: String): DataFrame = {
    val header = Seq(
      "#separator \\x09",
      "#set_separator\t,",
      "#empty_field\t(empty)",
      "#unset_field\t-",
      "#path\tconn",
      "#fields\tts\tuid\torig_bytes\tlocal_orig\ttags",
      "#types\ttime\tstring\tcount\tbool\tset[string]")
    import s.implicits._
    val headerDf = header.toDF("line")
    val rows = t(s, d, "events").select(concat(
      (col("event_id") + 1700000000L).cast("string"), lit(".000000\tC"),
      col("event_id").cast("string"),
      lit("\t"), when(pmod(col("event_id"), lit(10)) === 0, "-")
        .otherwise(pmod(col("event_id"), lit(4096)).cast("string")),
      lit("\t"), when(pmod(col("event_id"), lit(2)) === 0, "T").otherwise("F"),
      lit("\t"), when(pmod(col("event_id"), lit(5)) === 0, lit("(empty)"))
        .otherwise(concat(lit("a"), pmod(col("event_id"), lit(3)).cast("string"), lit(",b")))
    ).as("line"))
    headerDf.unionByName(rows)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_grok_lib" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"), accessLine.as("line"))
        .select((col("event_id") +: AccessGrok.columns(col("line"))): _*)),

    "q_syslog5424" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"), syslog5424Line.as("line"))
        .select((Seq(col("event_id")) ++ Syslog5424.headerColumns(col("line"))): _*)),

    "q_syslog5424_sd" -> ((s, d) =>
      Syslog5424.sdExploded(
        t(s, d, "events").select(col("event_id"), syslog5424Line.as("line")), "line")
        .select("event_id", "sd_id", "sd_key", "sd_value")),

    "q_cef" -> ((s, d) =>
      Cef.exploded(t(s, d, "events").select(col("event_id"), cefLine.as("line")), "line")
        .select("event_id", "cef_version", "device_vendor", "device_product",
          "signature_id", "name", "severity", "ext_key", "ext_value")),

    "q_leef" -> ((s, d) =>
      Leef.exploded(t(s, d, "events").select(col("event_id"), leefLine.as("line")), "line")
        .select("event_id", "leef_version", "vendor", "product_name", "leef_event_id",
          "attr_key", "attr_value")),

    // WARC framing + header parse: each doc becomes a request+response record
    // pair in one blob; records() splits, parse() extracts. The oracle
    // recomputes the expected fields directly from the source columns.
    "q_warc" -> ((s, d) => {
      val blob = concat(
        lit("WARC/1.0\r\nWARC-Type: request\r\nWARC-Record-ID: <urn:uuid:req-"),
        col("doc_id"), lit(">\r\nWARC-Target-URI: https://"), col("source"),
        lit("/doc/"), col("doc_id"),
        lit("\r\nWARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: 0\r\n\r\n"),
        lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:resp-"),
        col("doc_id"), lit(">\r\nWARC-Target-URI: https://"), col("source"),
        lit("/doc/"), col("doc_id"),
        lit("\r\nWARC-Date: 2026-01-01T00:00:00Z\r\nContent-Type: text/plain\r\nContent-Length: "),
        length(col("text")), lit("\r\n\r\n"), col("text"))
      t(s, d, "documents")
        .select(col("doc_id"), explode(Warc.records(blob)).as("rec"))
        .select(col("doc_id"), Warc.parse(col("rec")).as("w"))
        .select(col("doc_id"), col("w.warc_type"), col("w.record_id"),
          col("w.target_uri"), col("w.warc_date"), col("w.content_type"),
          col("w.content_length"), col("w.body"))
    }),

    // --------------------------------------------- robots.txt (RFC 9309)
    // two groups (wildcard; two stacked agents) + a comment, a blank line,
    // and a global Sitemap — every doc yields 7 rows
    "q_robots" -> ((s, d) => {
      val txt = concat_ws("\n",
        lit("# synthetic robots"),
        lit("User-agent: *"),
        concat(lit("Disallow: /private/"), col("doc_id")),
        lit("Allow: /public  # open"),
        concat(lit("User-agent: bot"), pmod(col("doc_id"), lit(5))),
        lit("User-agent: crawler"),
        concat(lit("Crawl-delay: "), pmod(col("doc_id"), lit(10))),
        lit("Disallow: /tmp"),
        lit(""),
        concat(lit("Sitemap: https://ex.com/s"), pmod(col("doc_id"), lit(3)), lit(".xml")))
      Robots.parse(t(s, d, "documents").select(col("doc_id"), txt.as("robots")),
        "robots", "doc_id")
    }),

    // ------------------------------------------ sitemap XML (sitemaps.org)
    // every 5th doc is a <sitemapindex>, the rest are <urlset> leaves with a
    // full entry, a loc-only entry (whitespace + &amp; entity), and a
    // loc-less entry that must be dropped
    "q_sitemap" -> ((s, d) => {
      val xml = when(pmod(col("doc_id"), lit(5)) === 0,
        concat(
          lit("<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
          lit("<sitemap><loc>https://"), col("source"),
          lit("/s1.xml</loc><lastmod>2026-02-01</lastmod></sitemap>"),
          lit("<sitemap><loc>https://"), col("source"), lit("/s2.xml</loc></sitemap>"),
          lit("</sitemapindex>")))
        .otherwise(concat(
          lit("<?xml version=\"1.0\"?><urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
          lit("<url><loc>https://"), col("source"), lit("/p/"),
          col("doc_id").cast("string"),
          lit("</loc><lastmod>2026-03-"),
          lpad((pmod(col("doc_id"), lit(28)) + 1).cast("string"), 2, "0"),
          lit("</lastmod><changefreq>daily</changefreq><priority>0."),
          pmod(col("doc_id"), lit(10)).cast("string"),
          lit("</priority></url>"),
          lit("<url><loc> https://"), col("source"), lit("/q?a=1&amp;b=2 </loc></url>"),
          lit("<url><changefreq>never</changefreq></url>"),
          lit("</urlset>")))
      Sitemap.parse(
        t(s, d, "documents").select(col("doc_id"), xml.as("xml")), "xml", "doc_id")
    }),

    "q_zeek" -> ((s, d) =>
      // tags joined to a scalar: array-typed outputs compare unreliably
      // across the parquet/pandas bridge
      Zeek.parse(zeekLines(s, d))
        .withColumn("tags", array_join(col("tags"), ","))),

    "q_json_infer" -> ((s, d) => {
      val raw = t(s, d, "events").select(
        col("event_id"),
        to_json(struct(
          col("event_id").as("id"),
          col("event_type").as("t"),
          struct(col("user_id").as("u")).as("n"))).as("js"))
      JsonInfer.parseInferred(raw, "js")
        .select(col("event_id"), col("parsed.id").as("id"), col("parsed.t").as("t"),
          col("parsed.n.u").as("u"))
    }),

    "q_sigma" -> ((s, d) => {
      val rule =
        """title: purchase spike or logins
          |detection:
          |  sel_purchase:
          |    event_type: purchase
          |    value|gte: 50
          |  sel_login:
          |    event_type|startswith: log
          |  condition: sel_purchase or sel_login
          |""".stripMargin
      val pred = graft.formats.Sigma.compile(rule, f => col(f))
      t(s, d, "events").filter(pred).select("event_id", "event_type", "value")
    }),

    "q_yaml" -> ((s, d) => {
      val sess = s
      import sess.implicits._
      val pairs = t(s, d, "events").select(
        col("event_id"),
        concat(
          lit("id: "), col("event_id").cast("string"),
          lit("\ntype: "), col("event_type"),
          lit("\nuser:\n  uid: "), col("user_id").cast("string"), lit("\n")).as("y"))
        .as[(Long, String)]
      graft.formats.Yaml.parseWithId(pairs)
        .select(col("id").as("event_id"), col("parsed.id").as("yid"),
          col("parsed.type").as("typ"), col("parsed.user.uid").as("uid"))
    }),

    "q_json_route" -> ((s, d) => {
      // multi-schema stream: purchases carry `amount`, everything else `note`
      val raw = t(s, d, "events").select(
        col("event_id"),
        when(col("event_type") === "purchase",
          to_json(struct(col("event_id").as("id"), col("event_type").as("type"),
            floor(col("value") * 100).cast("long").as("amount"))))
          .otherwise(
            to_json(struct(col("event_id").as("id"), col("event_type").as("type"),
              concat(lit("n"), col("user_id")).as("note")))).as("js"))
      val routes = JsonInfer.routeBySelector(raw, "js", "type")
      routes("purchase").select(col("event_id"), col("parsed.id").as("id"),
        col("parsed.amount").as("amount"))
    }),

    // ------------------------------------------------ codecs (§2.6 compress)
    // round-trip through every in-pipeline codec must be the identity on the
    // raw text bytes — the oracle is the uncompressed column itself
    "q_codec_roundtrip" -> ((s, d) => {
      val b = col("text").cast("binary")
      def rt(codec: String): Column =
        Codec.decompress(Codec.compress(b, codec), codec).cast("string")
      t(s, d, "documents").select(col("doc_id"),
        rt("gzip").as("gz"), rt("zlib").as("zl"), rt("lz4").as("lz"),
        rt("zstd").as("zs"), rt("bz2").as("bz"))
    }),

    // ------------------------------- feather / bitz (§2.6 Arrow at-rest/wire)
    // write → read must be the identity on typed columns; the oracle is the
    // source projection itself (clean-before-build scratch, as replayLake)
    "q_feather_roundtrip" -> ((s, d) => {
      val work = s"${System.getProperty("java.io.tmpdir")}/graft-q-feather"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
      val df = t(s, d, "documents").select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("len"),
        (col("doc_id") % 7).cast("double").as("dbl"))
      Feather.save(df, work)
      Feather.load(s, work)
    }),

    "q_bitz_roundtrip" -> ((s, d) => {
      val work = s"${System.getProperty("java.io.tmpdir")}/graft-q-bitz"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
      val df = t(s, d, "events").select(col("event_id"), col("event_type"),
        col("user_id"))
      Bitz.save(df, work, batchRows = 4096)
      Bitz.load(s, work)
    }),

    // -------------------------------------- JSON-dialect streams (read_gelf)
    "q_gelf" -> ((s, d) => {
      val host = concat(lit("h"), pmod(col("user_id"), lit(50)).cast("string"))
      def frame(sm: Column): Column = to_json(struct(
        lit("1.1").as("version"), host.as("host"),
        sm.as("short_message"), col("event_id").as("_id")))
      val chunks = t(s, d, "events").select(
        concat(frame(col("event_type")), lit(0.toChar.toString),
          frame(lit("ack"))).as("chunk"))
      JsonStreams.readGelf(chunks, "chunk")
        .select(col("parsed._id").as("id"), col("parsed.host").as("host"),
          col("parsed.short_message").as("sm"))
    }),

    "q_suricata" -> ((s, d) => {
      val raw = t(s, d, "events").select(
        when(col("event_type") === "purchase",
          to_json(struct(lit("alert").as("event_type"), col("event_id").as("id"),
            struct(pmod(col("event_id"), lit(40)).as("signature_id"),
              (pmod(col("event_id"), lit(5)) + 1).as("severity")).as("alert"))))
          .otherwise(
            to_json(struct(lit("flow").as("event_type"), col("event_id").as("id"),
              struct(floor(col("value") * 10).cast("long").as("bytes_toserver"))
                .as("flow")))).as("line"))
      JsonStreams.readSuricata(raw, "line")("alert")
        .select(col("parsed.id").as("id"),
          col("parsed.alert.signature_id").as("signature_id"),
          col("parsed.alert.severity").as("severity"))
    }),

    "q_zeek_json" -> ((s, d) => {
      val raw = t(s, d, "events").select(
        when(pmod(col("event_id"), lit(2)) === 0,
          to_json(struct(lit("conn").as("_path"), col("event_id").as("uid"),
            floor(col("value") * 100).cast("long").as("orig_bytes"))))
          .otherwise(
            to_json(struct(lit("dns").as("_path"), col("event_id").as("uid"),
              concat(col("event_type"), lit(".example.com")).as("query")))).as("line"))
      JsonStreams.readZeekJson(raw, "line")("conn")
        .select(col("parsed.uid").as("uid"), col("parsed.orig_bytes").as("orig_bytes"))
    }),

    // @name event metadata on selector-routed frames (expressions.md:107-112
    // + the reference's `--selector field:prefix` schema naming): the routed
    // zeek-json frame carries `@name = "zeek.<_path>"`, filterable like any
    // field
    "q_meta_route" -> ((s, d) => {
      val raw = t(s, d, "events").select(
        when(pmod(col("event_id"), lit(2)) === 0,
          to_json(struct(lit("conn").as("_path"), col("event_id").as("uid"),
            floor(col("value") * 100).cast("long").as("orig_bytes"))))
          .otherwise(
            to_json(struct(lit("dns").as("_path"), col("event_id").as("uid"),
              concat(col("event_type"), lit(".example.com")).as("query")))).as("line"))
      JsonStreams.readZeekJson(raw, "line")("conn")
        .filter(col("@name") === "zeek.conn")
        .select(col("parsed.uid").as("uid"), col("@name").as("schema_name"))
    })
  )

  val oracleSql: Map[String, String] = {
    // both engines run the SAME compiled grok regex with the SAME group idx
    // (single quotes in pattern bodies must be doubled inside the SQL literal)
    val grokRe = AccessGrok.regex.replace("'", "''")
    val grokCols = AccessGrok.fields.map { f =>
      val ex = s"regexp_extract(line, '$grokRe', ${f.group})"
      f.conv match {
        case "int" => s"CAST($ex AS BIGINT) AS ${f.name}"
        case "float" => s"CAST($ex AS DOUBLE) AS ${f.name}"
        case _ => s"$ex AS ${f.name}"
      }
    }.mkString(",\n  ")

    val accessRaw =
      """SELECT event_id, concat('10.', CAST(user_id % 256 AS VARCHAR), '.0.1 frank alice [',
        |  strftime(ts, '%d/%b/%Y:%H:%M:%S'), ' +0000] "GET /p/', event_type, ' HTTP/1.1" ',
        |  CAST(200 + (event_id % 3) * 100 AS VARCHAR), ' ',
        |  CAST(event_id % 5000 AS VARCHAR)) AS line FROM events""".stripMargin

    val sys5424Raw =
      """SELECT event_id, concat('<', CAST(8 + event_id % 184 AS VARCHAR), '>1 ',
        |  strftime(ts, '%Y-%m-%dT%H:%M:%S'), ' host', CAST(user_id % 50 AS VARCHAR),
        |  ' app', CAST(event_id % 7 AS VARCHAR), ' ', CAST(event_id % 997 AS VARCHAR),
        |  ' MSG', CAST(event_id % 13 AS VARCHAR),
        |  ' [meta@1 type="', event_type, '" uid="', CAST(user_id AS VARCHAR),
        |  '"][timing@2 ms="', CAST(event_id % 900 AS VARCHAR),
        |  '"] event ', event_type, ' fired') AS line FROM events""".stripMargin

    val lineRe = Syslog5424.LineRegex
    val sdElRe = Syslog5424.SdElementRegex
    val sdPmRe = Syslog5424.SdParamRegex.replace("'", "''")

    Map(
      "q_grok_lib" ->
        s"""WITH raw AS ($accessRaw)
           |SELECT event_id,
           |  $grokCols
           |FROM raw""".stripMargin,
      "q_syslog5424" ->
        s"""WITH raw AS ($sys5424Raw)
           |SELECT event_id,
           |  CAST(regexp_extract(line, '$lineRe', 1) AS BIGINT) // 8 AS facility,
           |  CAST(regexp_extract(line, '$lineRe', 1) AS BIGINT) % 8 AS severity,
           |  CAST(regexp_extract(line, '$lineRe', 2) AS BIGINT) AS version,
           |  CAST(nullif(regexp_extract(line, '$lineRe', 3), '-') AS TIMESTAMP) AS ts,
           |  nullif(regexp_extract(line, '$lineRe', 4), '-') AS hostname,
           |  nullif(regexp_extract(line, '$lineRe', 5), '-') AS app_name,
           |  nullif(regexp_extract(line, '$lineRe', 6), '-') AS proc_id,
           |  nullif(regexp_extract(line, '$lineRe', 7), '-') AS msg_id,
           |  nullif(regexp_extract(line, '$lineRe', 9), '-') AS message
           |FROM raw""".stripMargin,
      "q_syslog5424_sd" ->
        s"""WITH raw AS ($sys5424Raw),
           |els AS (
           |  SELECT event_id, unnest(regexp_extract_all(
           |    nullif(regexp_extract(line, '$lineRe', 8), '-'), '$sdElRe', 1)) AS el
           |  FROM raw
           |)
           |SELECT event_id, regexp_extract(el, '^(\\S+)', 1) AS sd_id,
           |  unnest(regexp_extract_all(el, '$sdPmRe', 1)) AS sd_key,
           |  unnest(list_transform(regexp_extract_all(el, '$sdPmRe', 2),
           |    v -> regexp_replace(v, '\\\\([\\\\"\\]])', '\\1', 'g'))) AS sd_value
           |FROM els""".stripMargin,
      "q_cef" ->
        """WITH raw AS (SELECT event_id, concat('CEF:0|graft|engine|1.0|sig-',
          |  CAST(event_id % 40 AS VARCHAR), '|', event_type, '|',
          |  CAST(event_id % 10 AS VARCHAR), '|src=10.', CAST(user_id % 256 AS VARCHAR),
          |  '.0.1 dpt=', CAST(event_id % 65536 AS VARCHAR), ' act=', event_type) AS line
          |  FROM events)
          |SELECT event_id,
          |  CAST(regexp_extract(split_part(line, '|', 1), '^CEF:(\d+)$', 1) AS BIGINT) AS cef_version,
          |  split_part(line, '|', 2) AS device_vendor,
          |  split_part(line, '|', 3) AS device_product,
          |  split_part(line, '|', 5) AS signature_id,
          |  split_part(line, '|', 6) AS name,
          |  split_part(line, '|', 7) AS severity,
          |  unnest(regexp_extract_all(regexp_extract(line, '^(?:[^|]*\|){7}(.*)$', 1),
          |    '([\w.]+)=([^ ]*)', 1)) AS ext_key,
          |  unnest(regexp_extract_all(regexp_extract(line, '^(?:[^|]*\|){7}(.*)$', 1),
          |    '([\w.]+)=([^ ]*)', 2)) AS ext_value
          |FROM raw""".stripMargin,
      "q_leef" ->
        """WITH raw AS (SELECT event_id, concat('LEEF:1.0|graft|engine|1.0|ev-',
          |  CAST(event_id % 40 AS VARCHAR), '|usrName=u', CAST(user_id AS VARCHAR),
          |  chr(9), 'sev=', CAST(event_id % 10 AS VARCHAR),
          |  chr(9), 'cat=', event_type) AS line FROM events)
          |SELECT event_id,
          |  regexp_extract(split_part(line, '|', 1), '^LEEF:(.+)$', 1) AS leef_version,
          |  split_part(line, '|', 2) AS vendor,
          |  split_part(line, '|', 3) AS product_name,
          |  split_part(line, '|', 5) AS leef_event_id,
          |  unnest(regexp_extract_all(regexp_extract(line, '^(?:[^|]*\|){5}(.*)$', 1),
          |    concat('([\w.]+)=([^', chr(9), ']*)'), 1)) AS attr_key,
          |  unnest(regexp_extract_all(regexp_extract(line, '^(?:[^|]*\|){5}(.*)$', 1),
          |    concat('([\w.]+)=([^', chr(9), ']*)'), 2)) AS attr_value
          |FROM raw""".stripMargin,
      // twin of q_robots: identical line split, comment strip, RFC 9309
      // group windows (lag for starts, running sum for ids), rules x agents
      "q_robots" ->
        """WITH src AS (SELECT doc_id,
          |  '# synthetic robots' || chr(10) ||
          |  'User-agent: *' || chr(10) ||
          |  'Disallow: /private/' || CAST(doc_id AS VARCHAR) || chr(10) ||
          |  'Allow: /public  # open' || chr(10) ||
          |  'User-agent: bot' || CAST(doc_id % 5 AS VARCHAR) || chr(10) ||
          |  'User-agent: crawler' || chr(10) ||
          |  'Crawl-delay: ' || CAST(doc_id % 10 AS VARCHAR) || chr(10) ||
          |  'Disallow: /tmp' || chr(10) || '' || chr(10) ||
          |  'Sitemap: https://ex.com/s' || CAST(doc_id % 3 AS VARCHAR) || '.xml' AS t
          |  FROM documents),
          |l AS (SELECT doc_id, unnest(string_split(t, chr(10))) AS raw,
          |    generate_subscripts(string_split(t, chr(10)), 1) - 1 AS line_no FROM src),
          |p0 AS (SELECT doc_id, line_no,
          |    trim(regexp_replace(raw, '#.*$', '')) AS ln FROM l),
          |p AS (SELECT doc_id, line_no,
          |    lower(regexp_extract(ln, '^([A-Za-z-]+)\s*:', 1)) AS field,
          |    trim(regexp_extract(ln, '^[A-Za-z-]+\s*:\s*(.*)$', 1)) AS value
          |  FROM p0
          |  WHERE lower(regexp_extract(ln, '^([A-Za-z-]+)\s*:', 1)) IN
          |    ('user-agent', 'allow', 'disallow', 'crawl-delay', 'sitemap')),
          |g AS (SELECT *, CASE WHEN field = 'user-agent' AND
          |      coalesce(lag(field = 'user-agent') OVER
          |        (PARTITION BY doc_id ORDER BY line_no), false) = false
          |    THEN 1 ELSE 0 END AS st FROM p WHERE field <> 'sitemap'),
          |gg AS (SELECT *, sum(st) OVER (PARTITION BY doc_id ORDER BY line_no
          |    ROWS UNBOUNDED PRECEDING) AS group_id FROM g),
          |a AS (SELECT doc_id, group_id, value AS agent FROM gg WHERE field = 'user-agent'),
          |r AS (SELECT doc_id, group_id, field AS rule, value,
          |    CAST(line_no AS BIGINT) AS line_no
          |  FROM gg WHERE field IN ('allow', 'disallow', 'crawl-delay') AND group_id > 0)
          |SELECT r.doc_id, a.agent, r.rule, r.value, r.line_no
          |FROM r JOIN a USING (doc_id, group_id)
          |UNION ALL
          |SELECT doc_id, NULL AS agent, 'sitemap' AS rule, value,
          |  CAST(line_no AS BIGINT) AS line_no
          |FROM p WHERE field = 'sitemap'""".stripMargin,

      // twin of q_sitemap: expected entries recomputed directly per planted
      // kind (index docs: 2 child sitemaps; leaf docs: full + loc-only entry,
      // the loc-less third entry never appears)
      "q_sitemap" ->
        """WITH e AS (SELECT * FROM (VALUES (0), (1)) AS t(entry_no))
          |SELECT d.doc_id, CAST(e.entry_no AS BIGINT) AS entry_no,
          |  (d.doc_id % 5 = 0) AS is_index,
          |  CASE WHEN d.doc_id % 5 = 0 THEN 'https://' || d.source ||
          |      CASE e.entry_no WHEN 0 THEN '/s1.xml' ELSE '/s2.xml' END
          |    ELSE CASE e.entry_no
          |      WHEN 0 THEN 'https://' || d.source || '/p/' || CAST(d.doc_id AS VARCHAR)
          |      ELSE 'https://' || d.source || '/q?a=1&b=2' END END AS loc,
          |  CASE WHEN d.doc_id % 5 = 0 AND e.entry_no = 0 THEN '2026-02-01'
          |    WHEN d.doc_id % 5 <> 0 AND e.entry_no = 0
          |      THEN '2026-03-' || lpad(CAST(d.doc_id % 28 + 1 AS VARCHAR), 2, '0')
          |    END AS lastmod,
          |  CASE WHEN d.doc_id % 5 <> 0 AND e.entry_no = 0 THEN 'daily' END AS changefreq,
          |  CASE WHEN d.doc_id % 5 <> 0 AND e.entry_no = 0
          |    THEN CAST('0.' || CAST(d.doc_id % 10 AS VARCHAR) AS DOUBLE) END AS priority
          |FROM documents d CROSS JOIN e""".stripMargin,

      // twin of q_warc: expected fields recomputed directly per record kind
      "q_warc" ->
        """WITH req AS (SELECT doc_id,
          |    'request' AS warc_type,
          |    '<urn:uuid:req-' || CAST(doc_id AS VARCHAR) || '>' AS record_id,
          |    'https://' || source || '/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
          |    '2026-01-01T00:00:00Z' AS warc_date,
          |    CAST(NULL AS VARCHAR) AS content_type,
          |    CAST(0 AS BIGINT) AS content_length,
          |    '' AS body
          |  FROM documents),
          |resp AS (SELECT doc_id,
          |    'response' AS warc_type,
          |    '<urn:uuid:resp-' || CAST(doc_id AS VARCHAR) || '>' AS record_id,
          |    'https://' || source || '/doc/' || CAST(doc_id AS VARCHAR) AS target_uri,
          |    '2026-01-01T00:00:00Z' AS warc_date,
          |    'text/plain' AS content_type,
          |    CAST(length(text) AS BIGINT) AS content_length,
          |    text AS body
          |  FROM documents)
          |SELECT * FROM req UNION ALL SELECT * FROM resp""".stripMargin,
      "q_zeek" ->
        """SELECT
          |  make_timestamp((event_id + 1700000000) * 1000000) AS ts,
          |  concat('C', CAST(event_id AS VARCHAR)) AS uid,
          |  CASE WHEN event_id % 10 = 0 THEN NULL ELSE event_id % 4096 END AS orig_bytes,
          |  (event_id % 2 = 0) AS local_orig,
          |  CASE WHEN event_id % 5 = 0 THEN ''
          |       ELSE concat('a', CAST(event_id % 3 AS VARCHAR), ',b') END AS tags
          |FROM events""".stripMargin,
      "q_json_infer" ->
        """SELECT event_id, event_id AS id, event_type AS t, user_id AS u
          |FROM events""".stripMargin,
      "q_yaml" ->
        """SELECT event_id, event_id AS yid, event_type AS typ, user_id AS uid
          |FROM events""".stripMargin,
      "q_sigma" ->
        """SELECT event_id, event_type, value FROM events
          |WHERE (lower(event_type) = 'purchase' AND value >= 50)
          |   OR lower(event_type) LIKE 'log%'""".stripMargin,
      "q_json_route" ->
        """SELECT event_id, event_id AS id, CAST(floor(value * 100) AS BIGINT) AS amount
          |FROM events WHERE event_type = 'purchase'""".stripMargin,
      // feather/bitz round-trip = identity: the oracle is the projection
      "q_feather_roundtrip" ->
        """SELECT doc_id, text, length(text) AS len,
          |  CAST(doc_id % 7 AS DOUBLE) AS dbl FROM documents""".stripMargin,
      "q_bitz_roundtrip" ->
        "SELECT event_id, event_type, user_id FROM events",
      // round-trip = identity: the oracle is the raw text column
      "q_codec_roundtrip" ->
        """SELECT doc_id, text AS gz, text AS zl, text AS lz, text AS zs, text AS bz
          |FROM documents""".stripMargin,
      "q_gelf" ->
        """SELECT event_id AS id, concat('h', CAST(user_id % 50 AS VARCHAR)) AS host,
          |  event_type AS sm FROM events
          |UNION ALL
          |SELECT event_id, concat('h', CAST(user_id % 50 AS VARCHAR)), 'ack' FROM events""".stripMargin,
      "q_suricata" ->
        """SELECT event_id AS id, event_id % 40 AS signature_id,
          |  event_id % 5 + 1 AS severity
          |FROM events WHERE event_type = 'purchase'""".stripMargin,
      "q_zeek_json" ->
        """SELECT event_id AS uid, CAST(floor(value * 100) AS BIGINT) AS orig_bytes
          |FROM events WHERE event_id % 2 = 0""".stripMargin,
      "q_meta_route" ->
        """SELECT event_id AS uid, 'zeek.conn' AS schema_name
          |FROM events WHERE event_id % 2 = 0""".stripMargin
    )
  }
}
