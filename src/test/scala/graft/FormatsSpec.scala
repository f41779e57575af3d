package graft

import org.apache.spark.sql.functions._

import graft.formats.{Cef, Grok, JsonInfer, Leef, Robots, Sitemap, Syslog5424, Warc, Zeek}

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------------- grok

  test("grok: capture counting is class- and escape-aware") {
    assert(Grok.countCaptures("(a)(b)") == 2)
    assert(Grok.countCaptures("(?:a)(?=b)(?!c)(?<=d)(?<!e)") == 0)
    assert(Grok.countCaptures("(?<name>x)") == 1)
    assert(Grok.countCaptures("""\((a)""") == 1)
    assert(Grok.countCaptures("""[(](a)""") == 1)
    assert(Grok.countCaptures("""[\](](a)""") == 1)
  }

  test("grok: compile resolves nested patterns with correct group indices") {
    val c = Grok.compile("%{NUMBER:num} %{WORD:w}")
    assert(c.fields.map(_.name) == Seq("num", "w"))
    val m = java.util.regex.Pattern.compile(c.regex).matcher("3.14 abc")
    assert(m.matches())
    assert(m.group(c.fields(0).group) == "3.14")
    assert(m.group(c.fields(1).group) == "abc")
  }

  test("grok: COMMONAPACHELOG nested semantics + conversions, no-match nulls") {
    val c = Grok.compile("%{COMMONAPACHELOG} %{NONNEGINT:extra:int}")
    val names = c.fields.map(_.name)
    assert(names.contains("clientip") && names.contains("response") && names.contains("extra"))
    val df = Seq(
      """127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache.gif HTTP/1.0" 200 2326 7""",
      "not a log line").toDF("line")
    val out = df.select(c.columns(col("line")): _*).collect()
    val row = out.find(_.getAs[String]("clientip") != null).get
    assert(row.getAs[String]("clientip") == "127.0.0.1")
    assert(row.getAs[String]("auth") == "frank")
    assert(row.getAs[String]("verb") == "GET")
    assert(row.getAs[Long]("extra") == 7L)
    assert(out.exists(r => r.getAs[String]("clientip") == null)) // no-match → null
  }

  test("grok: user-defined pattern definitions") {
    val defs = Grok.parseDefinitions("# comment\nHEXID 0x[0-9a-f]+\n")
    val c = Grok.compile("id=%{HEXID:hid}", defs)
    val out = Seq("id=0xdeadbeef").toDF("line").select(c.columns(col("line")): _*).head()
    assert(out.getAs[String]("hid") == "0xdeadbeef")
  }

  // ----------------------------------------------------------------- syslog

  test("syslog RFC5424: header, nil values, SD with escaped params") {
    val line =
      """<165>1 2023-10-11T22:14:15 host1 app - ID47 [ex@32473 k="v" esc="a\"b\]c"][x@1 n="1"] hello world"""
    val df = Seq(line, "<13>1 - - - - - - short").toDF("line")
    val out = df.select((col("line") +: Syslog5424.headerColumns(col("line"))): _*)
      .orderBy("facility").collect()
    val full = out(1)
    assert(full.getAs[Long]("facility") == 20L && full.getAs[Long]("severity") == 5L)
    assert(full.getAs[String]("hostname") == "host1")
    assert(full.getAs[String]("proc_id") == null) // nil -
    assert(full.getAs[String]("message") == "hello world")
    val nil = out(0)
    assert(nil.getAs[java.time.LocalDateTime]("ts") == null)
    assert(nil.getAs[String]("message") == "short")

    val sd = df.filter(col("line").contains("ex@")).select(Syslog5424.structuredData(col("line")).as("sd"))
      .head().getAs[Map[String, Map[String, String]]]("sd")
    assert(sd("ex@32473")("k") == "v")
    assert(sd("ex@32473")("esc") == """a"b]c""") // unescaped
    assert(sd("x@1")("n") == "1")
  }

  test("syslog/CEF printers round-trip through their parsers") {
    val line =
      """<165>1 2023-10-11T22:14:15 host1 app - ID47 [ex@32473 k="v" esc="a\"b\]c"] hello"""
    val df = Seq(line).toDF("line")
    val reprinted = df.select(Syslog5424.printLine(
      lit(20L), lit(5L),
      lit("2023-10-11T22:14:15").cast("timestamp_ntz"), lit("host1"), lit("app"),
      lit(null).cast("string"), lit("ID47"),
      Syslog5424.structuredData(col("line")), lit("hello")).as("out")).head().getString(0)
    assert(reprinted == line, s"got: $reprinted")

    val cef = "CEF:0|Ven\\|dor|Product|1.2|42|Port scan|7|src=10.0.0.1 spt=1232"
    val printed = Seq(1).toDF("x").select(Cef.printLine(
      lit(0L), lit("Ven|dor"), lit("Product"), lit("1.2"), lit("42"),
      lit("Port scan"), lit(7L),
      map(lit("src"), lit("10.0.0.1"), lit("spt"), lit("1232"))).as("out")).head().getString(0)
    assert(printed == cef, s"got: $printed")
  }

  // --------------------------------------------------------------- CEF/LEEF

  test("CEF: header fields and extension map") {
    val line = "CEF:0|Vendor|Product|1.2|42|Port scan|7|src=10.0.0.1 dst=2.1.2.2 spt=1232"
    val df = Seq(line).toDF("line")
    val h = df.select(Cef.headerColumns(col("line")): _*).head()
    assert(h.getAs[Long]("cef_version") == 0L)
    assert(h.getAs[String]("device_vendor") == "Vendor")
    assert(h.getAs[String]("name") == "Port scan")
    assert(h.getAs[String]("severity") == "7")
    val ext = df.select(Cef.extensions(col("line")).as("e")).head().getAs[Map[String, String]]("e")
    assert(ext == Map("src" -> "10.0.0.1", "dst" -> "2.1.2.2", "spt" -> "1232"))
  }

  test("LEEF: 1.0 and 2.0 (hex delimiter) attribute parsing") {
    assert(Leef.parseDelimiter("x09") == "\t")
    assert(Leef.parseDelimiter("0x7c") == "|")
    assert(Leef.parseDelimiter("^") == "^")
    assert(Leef.parseDelimiter("") == "\t")
    val v1 = "LEEF:1.0|Vendor|Product|1.0|evt|a=1\tb=two"
    val v2 = "LEEF:2.0|Vendor|Product|1.0|evt|^|a=1^b=two"
    val d1 = Seq(v1).toDF("line")
      .select(Leef.attributes(col("line")).as("a")).head().getAs[Map[String, String]]("a")
    assert(d1 == Map("a" -> "1", "b" -> "two"))
    val d2 = Seq(v2).toDF("line")
      .select(Leef.attributes(col("line"), "^").as("a")).head().getAs[Map[String, String]]("a")
    assert(d2 == Map("a" -> "1", "b" -> "two"))
  }

  // ------------------------------------------------------------------- zeek

  test("zeek TSV: typed parse with unset/empty/set handling") {
    val lines = Seq(
      "#separator \\x09",
      "#set_separator\t,",
      "#empty_field\t(empty)",
      "#unset_field\t-",
      "#path\tconn",
      "#fields\tts\tuid\tid.orig_p\tduration\tlocal_orig\ttags",
      "#types\ttime\tstring\tport\tinterval\tbool\tset[string]",
      "1258531221.486539\tPii6cU\t68\t0.163820\tT\ta,b",
      "1258531680.237254\tnkCxlv\t-\t-\tF\t(empty)",
      "#close\t2014-05-23-18-02-04").toDF("line")
    val out = Zeek.parse(lines).orderBy("uid").collect()
    assert(out.length == 2)
    val r1 = out.find(_.getAs[String]("uid") == "Pii6cU").get
    assert(r1.getAs[Long]("id_orig_p") == 68L)
    assert(math.abs(r1.getAs[Double]("duration") - 0.16382) < 1e-9)
    assert(r1.getAs[Boolean]("local_orig"))
    assert(r1.getSeq[String](r1.fieldIndex("tags")).toSeq == Seq("a", "b"))
    assert(r1.getAs[java.time.LocalDateTime]("ts").getYear == 2009)
    val r2 = out.find(_.getAs[String]("uid") == "nkCxlv").get
    assert(r2.isNullAt(r2.fieldIndex("id_orig_p")))
    assert(r2.isNullAt(r2.fieldIndex("duration")))
    assert(r2.getSeq[String](r2.fieldIndex("tags")).isEmpty)
  }

  // ------------------------------------------------------------------- yaml

  test("yaml: nested docs and multi-document streams parse to typed rows") {
    assert(graft.formats.Yaml.yamlDocsToJson("a: 1\nb:\n  c: x\n") ==
      Seq("""{"a":1,"b":{"c":"x"}}"""))
    assert(graft.formats.Yaml.yamlDocsToJson("a: 1\n---\na: 2\n").size == 2)
    val pairs = Seq((1L, "k: v\nn: 7\n"), (2L, "k: w\nn: 8\n---\nk: x\nn: 9\n"))
      .toDS()
    val out = graft.formats.Yaml.parseWithId(pairs)
      .select(col("id"), col("parsed.k"), col("parsed.n"))
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set((1L, "v", 7L), (2L, "w", 8L), (2L, "x", 9L)))
  }

  // ------------------------------------------------------------------ sigma

  test("sigma: modifiers, wildcards, quantifiers, and condition grammar") {
    val df = Seq(
      (1L, "cmd.exe", "C:\\Windows\\System32\\cmd.exe /c whoami", 9.0),
      (2L, "powershell.exe", "powershell -enc SQBFAFgA", 3.0),
      (3L, "bash", "/bin/bash -c ls", 1.0)).toDF("id", "image", "cmdline", "score")
    def fc(f: String) = col(f)
    val rule =
      """title: suspicious exec
        |detection:
        |  sel_img:
        |    image|endswith: .exe
        |  sel_enc:
        |    cmdline|contains: -enc
        |  sel_score:
        |    score|gte: 5
        |  condition: sel_img and (sel_enc or sel_score)
        |""".stripMargin
    val ids = df.filter(graft.formats.Sigma.compile(rule, fc)).select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L)) // 1: score>=5; 2: -enc; 3: not .exe
    // wildcards + not + 1 of prefix*
    val rule2 =
      """detection:
        |  sel_a:
        |    image: 'cmd*'
        |  sel_b:
        |    image: 'power?hell.exe'
        |  condition: 1 of sel_* and not sel_b
        |""".stripMargin
    val ids2 = df.filter(graft.formats.Sigma.compile(rule2, fc)).select("id").as[Long].collect().toSet
    assert(ids2 == Set(1L))
    // keyword list search over a raw column
    val rule3 =
      """detection:
        |  keywords:
        |    - whoami
        |    - nltest
        |  condition: keywords
        |""".stripMargin
    val ids3 = df.withColumnRenamed("cmdline", "raw")
      .filter(graft.formats.Sigma.compile(rule3, fc)).select("id").as[Long].collect().toSet
    assert(ids3 == Set(1L))
    // precedence: and binds tighter than or — `a or b and c` = a or (b and c)
    // (left-assoc-equal would give (a or b) and c and wrongly drop row 3)
    val rule4 =
      """detection:
        |  sel_bash:
        |    image: bash
        |  sel_enc:
        |    cmdline|contains: -enc
        |  sel_score:
        |    score|gte: 5
        |  condition: sel_bash or sel_enc and sel_score
        |""".stripMargin
    val ids4 = df.filter(graft.formats.Sigma.compile(rule4, fc)).select("id").as[Long].collect().toSet
    assert(ids4 == Set(3L), "and must bind tighter than or")
  }

  // ----------------------------------------------------------- JSON inference

  test("json inference merges fields and widens; selector routes per-schema") {
    val df = Seq(
      """{"type":"a","x":1}""",
      """{"type":"a","x":2,"y":"s"}""",
      """{"type":"b","z":3.5}""").toDF("js")
    // merge policy: one schema over everything
    val merged = JsonInfer.parseInferred(df, "js")
    val fields = merged.select("parsed.*").columns.toSet
    assert(fields == Set("type", "x", "y", "z"))
    // precise policy: per-selector schemas
    val routes = JsonInfer.routeBySelector(df, "js", "type")
    assert(routes.keySet == Set("a", "b"))
    assert(routes("a").select("parsed.*").columns.toSet == Set("type", "x", "y"))
    assert(routes("b").select("parsed.*").columns.toSet == Set("type", "z"))
    assert(routes("a").count() == 2 && routes("b").count() == 1)
  }

  test("zeek TSV printer round-trips through the parser") {
    import graft.formats.Zeek
    val df = Seq(
      (1700000001L, "C1", Some(42L), Some(true), Seq("a", "b")),
      (1700000002L, "C2", None, Some(false), Seq.empty[String]),
      (1700000003L, "C3", Some(7L), None, Seq("c"))
    ).toDF("ts0", "uid", "orig_bytes", "local_orig", "tags")
      .select(
        timestamp_micros(col("ts0") * 1000000L).cast("timestamp_ntz").as("ts"),
        col("uid"), col("orig_bytes"), col("local_orig"), col("tags"))
    val fields = Seq("ts", "uid", "orig_bytes", "local_orig", "tags")
    val types = Seq("time", "string", "count", "bool", "set[string]")
    val printed = Zeek.print(df, "conn", fields, types)
    assert(printed.filter(col("line").startsWith("#")).count() == 7)
    val back = Zeek.parse(printed).orderBy("uid").collect()
    assert(back(0).getAs[java.time.LocalDateTime]("ts").toEpochSecond(java.time.ZoneOffset.UTC) == 1700000001L)
    assert(back(0).getAs[Long]("orig_bytes") == 42L)
    assert(back(1).isNullAt(back(1).fieldIndex("orig_bytes")), "unset round-trips to null")
    assert(back(0).getAs[Boolean]("local_orig") && !back(1).getAs[Boolean]("local_orig"))
    assert(back(0).getAs[scala.collection.Seq[String]]("tags").toSeq == Seq("a", "b"))
    assert(back(1).getAs[scala.collection.Seq[String]]("tags").isEmpty, "(empty) round-trips to []")
    assert(back(2).isNullAt(back(2).fieldIndex("local_orig")),
      "unset bool must round-trip as null, not false")
  }

  test("yaml printer emits one document per row, parseable back") {
    import graft.formats.Yaml
    val df = Seq((1L, "alpha", 2.5), (2L, "beta", 0.5)).toDF("id", "name", "score")
    val docs = Yaml.print(df).as[String].collect().sorted
    assert(docs.length == 2 && docs.forall(_.contains("name:")))
    val back = docs.flatMap(Yaml.yamlDocsToJson).sorted
    assert(back(0) == """{"id":1,"name":"alpha","score":2.5}""")
  }

  // ------------------------------------------------------------------- warc

  test("warc: record split + header parse + body extraction") {
    val blob =
      "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 0\r\n\r\n" +
      "WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:42>\r\n" +
      "WARC-Target-URI: https://example.com/a\r\n" +
      "WARC-Date: 2026-02-03T04:05:06Z\r\nContent-Type: text/html\r\n" +
      "Content-Length: 12\r\n\r\nhello\nworld!"
    val out = Seq(blob).toDF("blob")
      .select(explode(Warc.records($"blob")).as("rec"))
      .select(Warc.parse($"rec").as("w")).select("w.*").collect()
    assert(out.length == 2)
    val info = out.find(_.getString(0) == "warcinfo").get
    assert(info.isNullAt(2) && info.getLong(5) == 0L && info.getString(6) == "")
    val resp = out.find(_.getString(0) == "response").get
    assert(resp.getString(1) == "<urn:uuid:42>")
    assert(resp.getString(2) == "https://example.com/a")
    assert(resp.getString(3) == "2026-02-03T04:05:06Z")
    assert(resp.getString(4) == "text/html" && resp.getLong(5) == 12L)
    // body keeps internal newlines; no header bleed
    assert(resp.getString(6) == "hello\nworld!")
    // a record with no blank-line separator has a null body, not a crash
    val hdrOnly = Seq("WARC/1.0\r\nWARC-Type: metadata").toDF("b")
      .select(Warc.parse($"b").as("w")).select("w.*").head()
    assert(hdrOnly.getString(0) == "metadata" && hdrOnly.isNullAt(6))

    // framing is anchored: a mid-line "WARC/1.0" in a body must NOT split
    val quoted = "WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 21\r\n\r\n" +
      "see WARC/1.0\n spec ok"
    val recs = Seq(quoted).toDF("b").select(Warc.records($"b").as("r")).head().getSeq[String](0)
    assert(recs.length == 1)
    assert(Seq(quoted).toDF("b").select(Warc.parse($"b").getField("body")).head()
      .getString(0) == "see WARC/1.0\n spec ok")

    // header match is line-anchored: X-Content-Length must not shadow
    // Content-Length, and a body line must not stand in for a missing header
    val shadow = "WARC/1.0\r\nX-Content-Length: 99\r\nContent-Length: 12\r\n\r\nbody"
    assert(Seq(shadow).toDF("b").select(Warc.field($"b", "Content-Length").cast("long"))
      .head().getLong(0) == 12L)
    // parse() scopes fields to the header block: a body line that looks like
    // a header must NOT stand in for a missing one
    val bodyTrap = "WARC/1.0\r\nContent-Length: 15\r\n\r\nwarc-type: fake"
    val trapped = Seq(bodyTrap).toDF("b").select(Warc.parse($"b").as("w")).head()
    assert(trapped.getStruct(0).isNullAt(0)) // warc_type stays null
    assert(trapped.getStruct(0).getString(6) == "warc-type: fake")
  }

  test("robots.txt: group stacking, comments, global sitemap, longest-match") {
    val txt = Seq(
      "# top comment",
      "Disallow: /orphan",          // before any group -> dropped
      "User-agent: *",
      "Disallow: /private",
      "Allow: /private/ok  # inline comment",
      "",                           // blank line does NOT break the group
      "Disallow: /cgi",
      "User-agent: googlebot",      // rule above closed the group -> new one
      "User-agent: bingbot",        // stacks into the same group
      "Crawl-delay: 5",
      "Sitemap: https://e.x/s.xml").mkString("\n")
    val out = Robots.parse(Seq((1L, txt)).toDF("doc_id", "robots"), "robots", "doc_id")
      .select("agent", "rule", "value").as[(Option[String], String, String)]
      .collect().toSet
    assert(out == Set(
      (Some("*"), "disallow", "/private"),
      (Some("*"), "allow", "/private/ok"),
      (Some("*"), "disallow", "/cgi"),
      (Some("googlebot"), "crawl-delay", "5"),
      (Some("bingbot"), "crawl-delay", "5"),
      (None, "sitemap", "https://e.x/s.xml")))

    // longest-match decisions, allow wins length ties, no match -> allowed
    val rules = typedLit(Seq(("disallow", "/private"), ("allow", "/private/ok")))
      .cast("array<struct<rule:string,value:string>>")
    val dec = Seq("/private/x", "/private/ok/y", "/other").toDF("path")
      .select(col("path"), Robots.isAllowed(rules, col("path")).as("a"))
      .as[(String, Boolean)].collect().toMap
    assert(dec == Map("/private/x" -> false, "/private/ok/y" -> true, "/other" -> true))
  }

  test("robots.txt: sitemap between stacked agents must not split the group (RFC 9309)") {
    val txt = Seq(
      "User-agent: a",
      "Sitemap: https://e.x/s.xml",   // "other record" — MUST NOT interfere
      "User-agent: b",
      "Disallow: /x").mkString("\n")
    val out = Robots.parse(Seq((1L, txt)).toDF("doc_id", "robots"), "robots", "doc_id")
      .select("agent", "rule", "value").as[(Option[String], String, String)]
      .collect().toSet
    assert(out == Set(
      (Some("a"), "disallow", "/x"),
      (Some("b"), "disallow", "/x"),
      (None, "sitemap", "https://e.x/s.xml")))
  }

  test("sitemap XML: urlset entries, index files, entities, missing-loc drop") {
    val urlset =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url><loc>https://e.x/a?q=1&amp;r=2</loc><lastmod>2026-01-05</lastmod>
        |    <changefreq>daily</changefreq><priority>0.8</priority></url>
        |  <url><loc> https://e.x/b </loc></url>
        |  <url><priority>0.1</priority></url>
        |</urlset>""".stripMargin
    val index =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc>https://e.x/s1.xml</loc><lastmod>2026-02-01</lastmod></sitemap>
        |  <sitemap><loc>https://e.x/s2.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val out = Sitemap.parse(Seq((1L, urlset), (2L, index)).toDF("doc_id", "xml"),
        "xml", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(out.size == 4) // missing-loc entry dropped
    val a = out((1L, 0L))
    assert(!a.getBoolean(2) && a.getString(3) == "https://e.x/a?q=1&r=2" &&
      a.getString(4) == "2026-01-05" && a.getString(5) == "daily" &&
      a.getDouble(6) == 0.8)
    val b = out((1L, 1L))
    assert(b.getString(3) == "https://e.x/b" && b.isNullAt(4) && b.isNullAt(6))
    assert(out((2L, 0L)).getBoolean(2) &&
      out((2L, 0L)).getString(3) == "https://e.x/s1.xml" &&
      out((2L, 0L)).getString(4) == "2026-02-01")
    assert(out((2L, 1L)).getString(3) == "https://e.x/s2.xml")
  }

  test("robots.txt: isAllowed supports RFC 9309 §2.2.3 wildcards (* and trailing $)") {
    def decide(rs: Seq[(String, String)], paths: String*): Map[String, Boolean] = {
      val rules = typedLit(rs).cast("array<struct<rule:string,value:string>>")
      paths.toDF("path")
        .select(col("path"), Robots.isAllowed(rules, col("path")).as("a"))
        .as[(String, Boolean)].collect().toMap
    }
    // `*` matches any byte sequence
    assert(decide(Seq(("disallow", "/*.php")), "/index.php", "/a/b.php", "/index.html") ==
      Map("/index.php" -> false, "/a/b.php" -> false, "/index.html" -> true))
    // trailing `$` anchors the end of the path
    assert(decide(Seq(("disallow", "/*.php$")), "/x.php", "/x.php?y=1") ==
      Map("/x.php" -> false, "/x.php?y=1" -> true))
    // regex metachars in the pattern are literal (only * and trailing $ are special)
    assert(decide(Seq(("disallow", "/a+b(c)")), "/a+b(c)/d", "/aab_c_") ==
      Map("/a+b(c)/d" -> false, "/aab_c_" -> true))
    // wildcard disallow vs longer allow: specificity is pattern octet length
    assert(decide(Seq(("disallow", "/p/*"), ("allow", "/p/public")), "/p/public/x", "/p/q") ==
      Map("/p/public/x" -> true, "/p/q" -> false))
  }
}
