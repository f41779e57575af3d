package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver-checked query catalog, part 3: the Tenzir format surface
  * (SURVEY.md §2.6 — parsers/printers between raw strings and events) plus a
  * second scalar-function batch and stream-utility sugar (§2.1 `repeat`).
  *
  * Tenzir parses bytes→events per format (`libtenzir/builtins/formats/json.cpp`,
  * `xsv.cpp`, `kv.cpp`, `syslog.cpp`, `grok.cpp`, `lines.cpp`) and prints
  * events→bytes (`print.cpp`); Spark-side these are `from_json`/`to_json`/
  * `from_csv`/`to_csv`/`str_to_map`/`regexp_extract` — all codegen'd Catalyst
  * expressions, no UDFs, so they stay inside whole-stage codegen at 100 TB.
  *
  * Each query synthesizes its raw input deterministically from the driver
  * tables (both engines build the identical string), then parses it back, so
  * the DuckDB oracle checks the *parse* path with exact value equality.
  */
object FormatQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** RFC3164-ish syslog line synthesized from events (both engines build the
    * same bytes; see oracle). Priority varies with event_id.
    */
  private def syslogLine: Column =
    concat(
      lit("<"), (lit(8) + pmod(col("event_id"), lit(184))).cast("string"), lit(">"),
      date_format(col("ts"), "MMM d HH:mm:ss"),
      lit(" host"), pmod(col("user_id"), lit(50)).cast("string"),
      lit(" app["), pmod(col("event_id"), lit(997)).cast("string"), lit("]: "),
      col("event_type"), lit(" uid="), col("user_id").cast("string"))

  /** Apache-combined-ish access-log line (the grok showcase format). */
  private def accessLine: Column =
    concat(
      lit("10."), pmod(col("user_id"), lit(256)).cast("string"), lit(".0.1 - - ["),
      date_format(col("ts"), "dd/MMM/yyyy:HH:mm:ss"), lit(" +0000] \"GET /"),
      col("event_type"), lit(" HTTP/1.1\" "),
      (lit(200) + pmod(col("event_id"), lit(3)) * 100).cast("string"), lit(" "),
      pmod(col("event_id"), lit(5000)).cast("string"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------------------------------------------------- JSON (§2.6)
    // props is real JSON ({"k": <int>}): parse via both the path-extract and
    // the schema'd-struct route (json.cpp's two policies: inferred vs declared)
    "q_parse_json" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_path"),
        from_json(col("props"), StructType(Seq(StructField("k", LongType))))
          .getField("k").as("k_struct"))),

    "q_print_json" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        to_json(struct(
          col("event_id").as("id"),
          col("event_type").as("t"),
          struct(col("user_id").as("u")).as("n"))).as("js"))),

    // ----------------------------------------------------------- CSV (§2.6)
    "q_parse_csv" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          concat_ws(",", col("event_id"), col("event_type"), col("user_id")).as("line"))
        .select(col("event_id"),
          from_csv(col("line"), StructType(Seq(
            StructField("id", LongType), StructField("typ", StringType),
            StructField("uid", LongType))), Map.empty[String, String]).as("r"))
        .select(col("event_id"), col("r.id").as("id"), col("r.typ").as("typ"),
          col("r.uid").as("uid"))),

    "q_print_csv" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        to_csv(struct(col("event_id"), col("event_type"), col("user_id"))).as("line"))),

    // ------------------------------------------------------------ KV (§2.6)
    "q_parse_kv" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          concat(lit("id="), col("event_id"), lit(" type="), col("event_type"),
            lit(" uid="), col("user_id")).as("line"))
        .select(col("event_id"),
          element_at(str_to_map(col("line"), lit(" "), lit("=")), "type").as("kv_type"),
          element_at(str_to_map(col("line"), lit(" "), lit("=")), "uid")
            .cast("long").as("kv_uid"))),

    // -------------------------------------------------------- syslog (§2.6)
    "q_parse_syslog" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"), syslogLine.as("line"))
        .select(
          col("event_id"),
          (regexp_extract(col("line"), "^<(\\d+)>", 1).cast("long") / 8)
            .cast("long").as("facility"),
          pmod(regexp_extract(col("line"), "^<(\\d+)>", 1).cast("long"), lit(8))
            .as("severity"),
          regexp_extract(col("line"), "^<\\d+>(\\w+ +\\d+ [\\d:]+) ", 1).as("ts_str"),
          regexp_extract(col("line"), "> ?[\\w: ]+ (host\\d+) ", 1).as("host"),
          regexp_extract(col("line"), " (\\w+)\\[(\\d+)\\]: ", 1).as("app"),
          regexp_extract(col("line"), " \\w+\\[(\\d+)\\]: ", 1).cast("long").as("pid"),
          regexp_extract(col("line"), "\\]: (.*)$", 1).as("msg"))),

    // -------------------------------------------- grok-style regex (§2.6)
    "q_parse_grok" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"), accessLine.as("line"))
        .select(
          col("event_id"),
          regexp_extract(col("line"), "^([\\d.]+) ", 1).as("client_ip"),
          regexp_extract(col("line"), "\"(\\w+) ", 1).as("method"),
          regexp_extract(col("line"), "\"\\w+ (\\S+) HTTP", 1).as("path"),
          regexp_extract(col("line"), "\" (\\d{3}) ", 1).cast("long").as("status"),
          regexp_extract(col("line"), " (\\d+)$", 1).cast("long").as("bytes"))),

    // --------------------------------------------------------- lines (§2.6)
    "q_parse_lines" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          explode(split(concat(col("event_type"), lit("\n"), col("props")), "\n"))
            .as("line"))),

    // ----------------------------------------------- scalar batch 2 (§2.4)
    "q_strfns2" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        ltrim(concat(lit("xx"), col("p_name")), "x").as("ltrimmed"),
        lpad(col("p_brand"), 12, "*").as("lp"),
        rpad(col("p_brand"), 12, "*").as("rp"),
        expr("split_part(p_type, ' ', 1)").as("first_word"),
        locate("a", col("p_name")).cast("long").as("pos_a"),
        expr("repeat(p_brand, 2)").as("rep2"),
        greatest(col("p_size"), lit(25)).cast("long").as("gmax"),
        least(col("p_size"), lit(25)).cast("long").as("lmin"),
        hex(col("p_brand")).as("hexed"),
        expr("left(p_name, 4)").as("l4"),
        translate(col("p_type"), "aeiou", "AEIOU").as("tl"))),

    // ---------------------------------------------------- `repeat` (§2.1)
    "q_repeat" -> ((s, d) => {
      val base = t(s, d, "region").select(col("r_regionkey"), col("r_name"))
      Seq.fill(3)(base).reduce(_ union _)
    }),

    // ------------------------------------------- `shell` escape hatch (§2.8)
    // pipe p_name through `tr a-z A-Z` — the external command is the operator
    // under test; the oracle recomputes its effect with upper()
    "q_shell" -> ((s, d) =>
      graft.ops.Shell.shell_(t(s, d, "part").select(col("p_name")), "p_name",
        Seq("tr", "a-z", "A-Z"))),

    // ------------------------------- xsv dialects + remaining printers (§2.6)
    // tsv/ssv are xsv.cpp's fixed-separator dialects; parse both ways and let
    // DuckDB re-split the identical synthesized lines
    "q_xsv" -> ((s, d) => {
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("typ", StringType),
        StructField("uid", LongType)))
      val raw = t(s, d, "events").select(col("event_id"),
        concat_ws("\t", col("event_id"), col("event_type"), col("user_id")).as("tline"),
        concat_ws(" ", col("event_id"), col("event_type"), col("user_id")).as("sline"))
      raw.select(col("event_id"),
        graft.formats.Printers.parseXsv(col("tline"), schema, "\t").as("tr"),
        graft.formats.Printers.parseXsv(col("sline"), schema, " ").as("sr"))
        .select(col("event_id"),
          col("tr.id").as("tid"), col("tr.typ").as("ttyp"), col("tr.uid").as("tuid"),
          col("sr.id").as("sid"), col("sr.typ").as("styp"), col("sr.uid").as("suid"))
    }),

    "q_print_kv" -> ((s, d) =>
      t(s, d, "events").select(col("event_id"),
        graft.formats.Printers.kvLine(struct(
          col("event_id").as("id"), col("event_type").as("t"),
          col("user_id").as("u")),
          StructType(Seq(StructField("id", LongType), StructField("t", StringType),
            StructField("u", LongType)))).as("line"))),

    // -------------------------- string classification predicates (§2.4)
    // is_alpha/is_alnum/is_numeric/is_lower/is_upper/is_printable/is_title +
    // capitalize (string.cpp classification fns) — identical regexes run in
    // both engines (all RE2-safe)
    "q_strclass" -> ((s, d) => {
      val variants = t(s, d, "part").select(col("p_partkey"),
        explode(array(col("p_name"), upper(col("p_brand")),
          initcap(col("p_type")), lit("abc123"), lit("42"),
          concat(col("p_name"), lit("")))).as("v"))
      variants.select(col("p_partkey"), col("v"),
        col("v").rlike("^[A-Za-z]+$").as("is_alpha"),
        col("v").rlike("^[A-Za-z0-9]+$").as("is_alnum"),
        col("v").rlike("^[0-9]+$").as("is_numeric"),
        (col("v").rlike("[a-z]") && !col("v").rlike("[A-Z]")).as("is_lower"),
        (col("v").rlike("[A-Z]") && !col("v").rlike("[a-z]")).as("is_upper"),
        col("v").rlike("^[\\x20-\\x7e]*$").as("is_printable"),
        col("v").rlike("^([A-Z][a-z0-9]*)( [A-Z][a-z0-9]*)*$").as("is_title"),
        concat(upper(substring(col("v"), 1, 1)), lower(expr("substring(v, 2)")))
          .as("capitalized"))
    }),

    "q_print_tql" -> ((s, d) => {
      val sch = StructType(Seq(
        StructField("id", LongType), StructField("t", StringType),
        StructField("n", StructType(Seq(StructField("u", LongType))))))
      // null string every 7th row exercises the `null` literal path
      t(s, d, "events").select(col("event_id"),
        graft.formats.Printers.tqlLiteral(struct(
          col("event_id").as("id"),
          when(pmod(col("event_id"), lit(7)) =!= 0, col("event_type")).as("t"),
          struct(col("user_id").as("u")).as("n")), sch).as("line"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_parse_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_struct
        |FROM events""".stripMargin,
    "q_print_json" ->
      """SELECT event_id, CAST(to_json(struct_pack(id := event_id, t := event_type,
        |  n := struct_pack(u := user_id))) AS VARCHAR) AS js
        |FROM events""".stripMargin,
    "q_parse_csv" ->
      """SELECT event_id, CAST(parts[1] AS BIGINT) AS id, parts[2] AS typ,
        |  CAST(parts[3] AS BIGINT) AS uid
        |FROM (SELECT event_id, string_split(concat_ws(',', CAST(event_id AS VARCHAR),
        |  event_type, CAST(user_id AS VARCHAR)), ',') AS parts FROM events)""".stripMargin,
    "q_print_csv" ->
      """SELECT event_id, concat_ws(',', CAST(event_id AS VARCHAR), event_type,
        |  CAST(user_id AS VARCHAR)) AS line FROM events""".stripMargin,
    "q_parse_kv" ->
      """SELECT event_id, regexp_extract(line, 'type=([^ ]+)', 1) AS kv_type,
        |  CAST(regexp_extract(line, 'uid=([^ ]+)', 1) AS BIGINT) AS kv_uid
        |FROM (SELECT event_id, concat('id=', CAST(event_id AS VARCHAR), ' type=', event_type,
        |  ' uid=', CAST(user_id AS VARCHAR)) AS line FROM events)""".stripMargin,
    "q_parse_syslog" ->
      """WITH raw AS (SELECT event_id, concat('<', CAST(8 + event_id % 184 AS VARCHAR), '>',
        |  strftime(ts, '%b %-d %H:%M:%S'), ' host', CAST(user_id % 50 AS VARCHAR),
        |  ' app[', CAST(event_id % 997 AS VARCHAR), ']: ', event_type,
        |  ' uid=', CAST(user_id AS VARCHAR)) AS line FROM events)
        |SELECT event_id,
        |  CAST(regexp_extract(line, '^<(\d+)>', 1) AS BIGINT) // 8 AS facility,
        |  CAST(regexp_extract(line, '^<(\d+)>', 1) AS BIGINT) % 8 AS severity,
        |  regexp_extract(line, '^<\d+>(\w+ +\d+ [\d:]+) ', 1) AS ts_str,
        |  regexp_extract(line, '> ?[\w: ]+ (host\d+) ', 1) AS host,
        |  regexp_extract(line, ' (\w+)\[\d+\]: ', 1) AS app,
        |  CAST(regexp_extract(line, ' \w+\[(\d+)\]: ', 1) AS BIGINT) AS pid,
        |  regexp_extract(line, '\]: (.*)$', 1) AS msg
        |FROM raw""".stripMargin,
    "q_parse_grok" ->
      """WITH raw AS (SELECT event_id, concat('10.', CAST(user_id % 256 AS VARCHAR), '.0.1 - - [',
        |  strftime(ts, '%d/%b/%Y:%H:%M:%S'), ' +0000] "GET /', event_type, ' HTTP/1.1" ',
        |  CAST(200 + (event_id % 3) * 100 AS VARCHAR), ' ',
        |  CAST(event_id % 5000 AS VARCHAR)) AS line FROM events)
        |SELECT event_id,
        |  regexp_extract(line, '^([\d.]+) ', 1) AS client_ip,
        |  regexp_extract(line, '"(\w+) ', 1) AS method,
        |  regexp_extract(line, '"\w+ (\S+) HTTP', 1) AS path,
        |  CAST(regexp_extract(line, '" (\d{3}) ', 1) AS BIGINT) AS status,
        |  CAST(regexp_extract(line, ' (\d+)$', 1) AS BIGINT) AS bytes
        |FROM raw""".stripMargin,
    "q_parse_lines" ->
      """SELECT event_id, unnest(string_split(concat(event_type, chr(10), props), chr(10))) AS line
        |FROM events""".stripMargin,
    "q_strfns2" ->
      """SELECT p_partkey,
        |  trim(concat('  ', p_name, '  ')) AS trimmed,
        |  ltrim(concat('xx', p_name), 'x') AS ltrimmed,
        |  lpad(p_brand, 12, '*') AS lp,
        |  rpad(p_brand, 12, '*') AS rp,
        |  split_part(p_type, ' ', 1) AS first_word,
        |  CAST(strpos(p_name, 'a') AS BIGINT) AS pos_a,
        |  repeat(p_brand, 2) AS rep2,
        |  CAST(greatest(p_size, 25) AS BIGINT) AS gmax,
        |  CAST(least(p_size, 25) AS BIGINT) AS lmin,
        |  hex(p_brand) AS hexed,
        |  left(p_name, 4) AS l4,
        |  translate(p_type, 'aeiou', 'AEIOU') AS tl
        |FROM part""".stripMargin,
    "q_repeat" ->
      """SELECT r_regionkey, r_name FROM region
        |UNION ALL SELECT r_regionkey, r_name FROM region
        |UNION ALL SELECT r_regionkey, r_name FROM region""".stripMargin,
    "q_shell" -> "SELECT upper(p_name) AS p_name FROM part",
    "q_xsv" ->
      """WITH raw AS (SELECT event_id,
        |  string_split(concat_ws(chr(9), CAST(event_id AS VARCHAR), event_type,
        |    CAST(user_id AS VARCHAR)), chr(9)) AS tp,
        |  string_split(concat_ws(' ', CAST(event_id AS VARCHAR), event_type,
        |    CAST(user_id AS VARCHAR)), ' ') AS sp FROM events)
        |SELECT event_id,
        |  CAST(tp[1] AS BIGINT) AS tid, tp[2] AS ttyp, CAST(tp[3] AS BIGINT) AS tuid,
        |  CAST(sp[1] AS BIGINT) AS sid, sp[2] AS styp, CAST(sp[3] AS BIGINT) AS suid
        |FROM raw""".stripMargin,
    "q_print_kv" ->
      """SELECT event_id, concat('id=', CAST(event_id AS VARCHAR), ' t=', event_type,
        |  ' u=', CAST(user_id AS VARCHAR)) AS line FROM events""".stripMargin,
    "q_strclass" ->
      """WITH v AS (SELECT p_partkey, unnest([p_name, upper(p_brand),
        |  list_aggregate(list_transform(string_split(p_type, ' '),
        |    w -> concat(upper(w[1]), lower(w[2:]))), 'string_agg', ' '),
        |  'abc123', '42', concat(p_name, '')]) AS v FROM part)
        |SELECT p_partkey, v,
        |  regexp_full_match(v, '[A-Za-z]+') AS is_alpha,
        |  regexp_full_match(v, '[A-Za-z0-9]+') AS is_alnum,
        |  regexp_full_match(v, '[0-9]+') AS is_numeric,
        |  (regexp_matches(v, '[a-z]') AND NOT regexp_matches(v, '[A-Z]')) AS is_lower,
        |  (regexp_matches(v, '[A-Z]') AND NOT regexp_matches(v, '[a-z]')) AS is_upper,
        |  regexp_full_match(v, '[\x20-\x7e]*') AS is_printable,
        |  regexp_full_match(v, '([A-Z][a-z0-9]*)( [A-Z][a-z0-9]*)*') AS is_title,
        |  concat(upper(v[1]), lower(v[2:])) AS capitalized
        |FROM v""".stripMargin,
    "q_print_tql" ->
      """SELECT event_id, concat('{id: ', CAST(event_id AS VARCHAR), ', t: ',
        |  CASE WHEN event_id % 7 = 0 THEN 'null' ELSE concat('"', event_type, '"') END,
        |  ', n: {u: ', CAST(user_id AS VARCHAR), '}}') AS line FROM events""".stripMargin
  )
}
