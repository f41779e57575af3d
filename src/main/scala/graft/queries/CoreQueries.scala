package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Pipe._

/** Driver-checked query catalog, part 1: the Tenzir relational / aggregation /
  * scalar-function operator surface (SURVEY.md §2.1, §2.3, §2.4) exercised
  * over the driver's TPC-H-ish parquet tables, each with an equivalent DuckDB
  * oracle SQL.
  *
  * Determinism rules applied throughout (so value-hash comparison against
  * DuckDB is exact, not approximate):
  *  - money aggregates go through DECIMAL(18,2) and cast back to double
  *    (exact decimal arithmetic in both engines — order-independent);
  *  - per-row double arithmetic is fine (IEEE ops are bitwise-deterministic);
  *  - integer-valued doubles (quantities) sum exactly in either engine;
  *  - every ranked/limited result has a total tiebreak order;
  *  - Spark INT results are cast to BIGINT wherever DuckDB's function returns
  *    BIGINT (count/len/row_number/year/...).
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------------------ §2.1 core
    "q_where" -> ((s, d) =>
      t(s, d, "lineitem")
        .where_(col("l_quantity") > 30 && col("l_returnflag") === "R")
        .select_("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")),

    "q_select" -> ((s, d) =>
      t(s, d, "orders").select_("o_orderkey", "o_custkey", "o_totalprice")),

    "q_drop" -> ((s, d) =>
      t(s, d, "orders").drop_("o_orderpriority", "o_orderstatus")),

    "q_set" -> ((s, d) =>
      t(s, d, "lineitem")
        .set_("revenue", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .select_("l_orderkey", "l_linenumber", "revenue")),

    "q_rename" -> ((s, d) =>
      t(s, d, "orders").rename_("id" -> "o_orderkey", "total" -> "o_totalprice")
        .select_("id", "total")),

    "q_flatten" -> ((s, d) =>
      t(s, d, "orders")
        .select(struct(col("o_orderkey").as("key"), col("o_totalprice").as("total")).as("o"),
          col("o_custkey"))
        .flatten_("_")),

    "q_unflatten" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey").as("ord_key"), col("o_totalprice").as("ord_total"))
        .unflatten_("_")
        .flatten_("_")),

    "q_unroll" -> ((s, d) =>
      t(s, d, "part")
        .select(col("p_partkey"), split(col("p_name"), " ").as("word"))
        .unroll_("word")),

    "q_enumerate" -> ((s, d) =>
      t(s, d, "orders").select_("o_orderkey")
        .enumerate_(Seq(col("o_orderkey")), "idx")
        .set_("idx", col("idx").cast("long"))),

    "q_dedup" -> ((s, d) =>
      t(s, d, "events")
        .deduplicate_(Seq("user_id"), Seq(col("event_id")))
        .select_("user_id", "event_id", "event_type")),

    "q_unique" -> ((s, d) =>
      t(s, d, "lineitem").select_("l_returnflag", "l_linestatus").distinct()),

    "q_sort_head" -> ((s, d) =>
      t(s, d, "lineitem")
        .head_(100, Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")))
        .select_("l_orderkey", "l_linenumber", "l_extendedprice")),

    "q_tail" -> ((s, d) =>
      t(s, d, "lineitem")
        .tail_(50,
          order = Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")),
          reversed = Seq(col("l_extendedprice").desc, col("l_orderkey").desc, col("l_linenumber").desc))
        .select_("l_orderkey", "l_linenumber", "l_extendedprice")),

    "q_slice" -> ((s, d) =>
      t(s, d, "orders").select_("o_orderkey")
        .slice_(100, 200, Seq(col("o_orderkey")), "idx")
        .set_("idx", col("idx").cast("long"))),

    // full slice semantics: negative end (count from the back) + stride
    "q_slice_stride" -> ((s, d) =>
      t(s, d, "orders").select_("o_orderkey")
        .slice_(10, -20, Seq(col("o_orderkey")), "idx", stride = 7)),

    // distance-based dedup: a key is forgotten after 100 events pass
    "q_dedup_distance" -> ((s, d) =>
      t(s, d, "events")
        .deduplicateDistance_(Seq("user_id"), Seq(col("event_id")), distance = 100)
        .select_("event_id", "user_id")),

    // first-class time shift (reference timeshift.cpp)
    "q_timeshift" -> ((s, d) =>
      t(s, d, "events")
        .timeshift_("ts", expr("INTERVAL 36 HOURS"))
        .select_("event_id", "ts")),

    // rate-adaptive sampling: each period's 1-in-k rate targets ~50 events
    // based on the previous period's count
    "q_sample_adaptive" -> ((s, d) =>
      t(s, d, "events")
        .sampleAdaptive_(col("ts"), periodSec = 86400, targetPerPeriod = 50,
          keyCol = col("event_id"))
        .select_("event_id", "user_id")),

    "q_taste" -> ((s, d) =>
      t(s, d, "events")
        .taste_(3, Seq("event_type"), Seq(col("event_id")))
        .select_("event_type", "event_id", "user_id")),

    "q_top" -> ((s, d) => t(s, d, "events").top_("event_type", 3)),

    "q_rare" -> ((s, d) => t(s, d, "events").rare_("event_type", 3)),

    "q_summarize" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val qtyDec = col("l_quantity").cast("decimal(18,2)")
      li.summarize_(Seq(col("l_returnflag"), col("l_linestatus")),
        sum(qtyDec).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        (sum(qtyDec).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("n"))
    }),

    "q_summarize_time" -> ((s, d) =>
      t(s, d, "orders")
        // date_trunc coerces NTZ→LTZ; cast back so the output parquet column
        // stays naive TIMESTAMP like the DuckDB oracle's (r1 schema FAIL).
        .groupBy(date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))),

    "q_group_collect" -> ((s, d) =>
      t(s, d, "events")
        .summarize_(Seq(col("event_type")),
          array_join(array_sort(collect_set(col("user_id").cast("string"))), ",").as("users"))),

    "q_if" -> ((s, d) =>
      t(s, d, "events").select(col("event_id"),
        when(col("value") > 100, "high").when(col("value") > 50, "mid")
          .otherwise("low").as("band"))),

    "q_if_route" -> ((s, d) =>
      t(s, d, "events")
        .ifElse_(col("event_type") === "purchase",
          _.set_("w", col("value") * lit(1.1)),
          _.set_("w", lit(0.0)))
        .select_("event_id", "w")),

    // ------------------------------------------------------- §2.2 joins
    "q_enrich" -> ((s, d) =>
      t(s, d, "lineitem")
        .set_("p_partkey", col("l_partkey"))
        .enrich_(t(s, d, "part").select_("p_partkey", "p_brand", "p_type"),
          Seq("p_partkey"), "inner")
        .select_("l_orderkey", "l_linenumber", "p_brand", "p_type")),

    "q_join_left" -> ((s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer").select_("c_custkey", "c_name", "c_mktsegment"),
          col("o_custkey") === col("c_custkey"), "left")
        .select_("o_orderkey", "c_name", "c_mktsegment")),

    "q_join_semi" -> ((s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer").where_(col("c_acctbal") > 5000).select_("c_custkey"),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .select_("o_orderkey", "o_custkey")),

    "q_join_anti" -> ((s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer").where_(col("c_acctbal") > 5000).select_("c_custkey"),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .select_("o_orderkey", "o_custkey")),

    "q_join_asof" -> ((s, d) =>
      t(s, d, "events")
        .join(t(s, d, "orders").select_("o_custkey", "o_orderdate"),
          col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"), "inner")
        .groupBy(col("event_id"), col("user_id"))
        .agg(max(col("o_orderdate")).as("last_order_ts"))),

    // ------------------------------------------------- §2.3 aggregation fns
    "q_agg_stats" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        count(lit(1)).as("n"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
        round(var_samp(col("l_quantity")), 6).as("var_qty"),
        median(col("l_quantity")).as("med_qty"))),

    "q_quantiles" -> ((s, d) =>
      t(s, d, "lineitem").agg(
        expr("percentile(l_quantity, 0.25)").as("q25"),
        expr("percentile(l_quantity, 0.5)").as("q50"),
        expr("percentile(l_quantity, 0.75)").as("q75"))),

    "q_mode" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("event_type")).agg(count(lit(1)).as("c"))
        .agg(max_by(col("event_type"), struct(col("c"), col("event_type"))).as("mode_value"))),

    "q_value_counts" -> ((s, d) =>
      t(s, d, "events").groupBy(col("event_type").as("value")).agg(count(lit(1)).as("n"))),

    "q_first_last" -> ((s, d) =>
      t(s, d, "events").groupBy(col("user_id")).agg(
        min_by(col("event_type"), col("event_id")).as("first_event"),
        max_by(col("event_type"), col("event_id")).as("last_event"),
        count(lit(1)).as("n"))),

    "q_any_all" -> ((s, d) =>
      t(s, d, "events").groupBy(col("user_id")).agg(
        bool_or(col("value") > 100).as("any_high"),
        bool_and(col("value") > 1).as("all_pos"))),

    // ---------------------------------------------------- §2.4 scalar fns
    "q_strfns" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        lower(col("p_name")).as("lname"),
        upper(col("p_brand")).as("ubrand"),
        substring(col("p_name"), 1, 5).as("pfx"),
        length(col("p_name")).cast("long").as("len"),
        regexp_replace(col("p_type"), " ", "_").as("slug"),
        reverse(col("p_brand")).as("rev"),
        col("p_name").startsWith("a").as("sw"),
        col("p_name").contains("st").as("ct"))),

    "q_regexfns" -> ((s, d) =>
      t(s, d, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_type"), "([a-z]+)$", 1).as("last_word"),
        col("p_type").rlike("a").as("m"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("novowels"))),

    "q_hashfns" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        md5(col("text")).as("h_md5"),
        sha2(col("text"), 256).as("h_sha256"),
        // base64 over ≤57 bytes: Spark MIME-chunks beyond 76 output chars,
        // DuckDB never does — short input keeps both unchunked
        base64(substring(col("text"), 1, 48).cast("binary")).as("b64"))),

    "q_timefns" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        year(col("ts")).cast("long").as("yr"),
        month(col("ts")).cast("long").as("mo"),
        dayofmonth(col("ts")).cast("long").as("dom"),
        hour(col("ts")).cast("long").as("hr"),
        date_trunc("day", col("ts")).cast("timestamp_ntz").as("day"),
        date_format(col("ts"), "yyyy-MM-dd HH").as("fmt"),
        unix_timestamp(col("ts")).as("unix_s"))),

    "q_timearith" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        (col("ts") + expr("INTERVAL 7 DAYS")).as("plus7d"),
        expr("timestampdiff(MINUTE, timestamp'2024-01-01 00:00:00', ts)").as("min_since"))),

    "q_numfns" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        abs(col("value") - 100).as("a"),
        floor(col("value")).as("fl"),
        ceil(col("value")).as("ce"),
        sqrt(col("value")).as("sq"),
        (col("value") * col("value")).as("sqr"))),

    "q_bitfns" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        col("event_id").bitwiseAND(255).as("b_and"),
        col("event_id").bitwiseOR(16).as("b_or"),
        col("event_id").bitwiseXOR(85).as("b_xor"),
        shiftleft(col("event_id"), 2).as("shl"),
        shiftright(col("event_id"), 3).as("shr"))),

    "q_listfns" -> ((s, d) => {
      val w = split(col("text"), " ")
      t(s, d, "documents").select(
        col("doc_id"),
        size(w).cast("long").as("n_words"),
        array_contains(w, "data").as("has_data"),
        array_join(slice(w, 1, 3), " ").as("first3"),
        element_at(w, 2).as("second"),
        size(array_distinct(w)).cast("long").as("n_distinct"))
    }),

    "q_nullfns" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        coalesce(when(col("event_type") === "error", lit(null)).otherwise(col("event_type")),
          lit("none")).as("et"),
        when(col("user_id") === 0, lit(null))
          .otherwise(col("value") / col("user_id")).as("per_user")))
  )

  val oracleSql: Map[String, String] = Map(
    "q_where" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem
        |WHERE l_quantity > 30 AND l_returnflag = 'R'""".stripMargin,
    "q_select" -> "SELECT o_orderkey, o_custkey, o_totalprice FROM orders",
    "q_drop" -> "SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders",
    "q_set" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice * (1.0 - l_discount) AS revenue FROM lineitem",
    "q_rename" -> "SELECT o_orderkey AS id, o_totalprice AS total FROM orders",
    "q_flatten" ->
      "SELECT o_orderkey AS o_key, o_totalprice AS o_total, o_custkey FROM orders",
    "q_unflatten" ->
      "SELECT o_orderkey AS ord_key, o_totalprice AS ord_total FROM orders",
    "q_unroll" ->
      "SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word FROM part",
    "q_enumerate" ->
      "SELECT o_orderkey, CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS idx FROM orders",
    "q_slice_stride" ->
      """WITH e AS (SELECT o_orderkey,
        |  CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS idx,
        |  count(*) OVER () AS n FROM orders)
        |SELECT o_orderkey, idx FROM e
        |WHERE idx >= 10 AND idx < n - 20 AND (idx - 10) % 7 = 0""".stripMargin,
    "q_dedup_distance" ->
      """WITH e AS (SELECT event_id, user_id,
        |  CAST(row_number() OVER (ORDER BY event_id) - 1 AS BIGINT) AS seq FROM events),
        |g AS (SELECT *, lag(seq) OVER (PARTITION BY user_id ORDER BY seq) AS prev FROM e)
        |SELECT event_id, user_id FROM g WHERE prev IS NULL OR seq - prev > 100""".stripMargin,
    "q_timeshift" ->
      "SELECT event_id, ts + INTERVAL 36 HOUR AS ts FROM events",
    "q_sample_adaptive" ->
      """WITH b AS (SELECT event_id, user_id,
        |  CAST(floor(epoch(ts) / 86400) AS BIGINT) AS bb FROM events),
        |c AS (SELECT bb, count(*) AS n FROM b GROUP BY bb),
        |r AS (SELECT bb, greatest(1, CAST(floor(
        |  CASE WHEN lag(bb) OVER (ORDER BY bb) = bb - 1
        |       THEN lag(n) OVER (ORDER BY bb) ELSE 0 END / 50)
        |  AS BIGINT)) AS k FROM c)
        |SELECT event_id, user_id FROM b JOIN r USING (bb)
        |WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % k = 0""".stripMargin,
    "q_dedup" ->
      """SELECT user_id, event_id, event_type FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id) = 1""".stripMargin,
    "q_unique" -> "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q_sort_head" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "q_tail" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC LIMIT 50""".stripMargin,
    "q_slice" ->
      """SELECT o_orderkey, CAST(rn - 1 AS BIGINT) AS idx FROM
        |(SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) AS rn FROM orders)
        |WHERE rn - 1 >= 100 AND rn - 1 < 200""".stripMargin,
    "q_taste" ->
      """SELECT event_type, event_id, user_id FROM events
        |QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY event_id) <= 3""".stripMargin,
    "q_top" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY n DESC, event_type LIMIT 3",
    "q_rare" ->
      "SELECT event_type, count(*) AS n FROM events GROUP BY event_type ORDER BY n ASC, event_type LIMIT 3",
    "q_summarize" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_summarize_time" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1""".stripMargin,
    "q_group_collect" ->
      """SELECT event_type,
        |  array_to_string(list_sort(list(DISTINCT CAST(user_id AS VARCHAR))), ',') AS users
        |FROM events GROUP BY 1""".stripMargin,
    "q_if" ->
      """SELECT event_id,
        |  CASE WHEN value > 100 THEN 'high' WHEN value > 50 THEN 'mid' ELSE 'low' END AS band
        |FROM events""".stripMargin,
    "q_if_route" ->
      "SELECT event_id, CASE WHEN event_type = 'purchase' THEN value * 1.1 ELSE 0.0 END AS w FROM events",
    "q_enrich" ->
      "SELECT l_orderkey, l_linenumber, p_brand, p_type FROM lineitem JOIN part ON l_partkey = p_partkey",
    "q_join_left" ->
      "SELECT o_orderkey, c_name, c_mktsegment FROM orders LEFT JOIN customer ON o_custkey = c_custkey",
    "q_join_semi" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)""".stripMargin,
    "q_join_anti" ->
      """SELECT o_orderkey, o_custkey FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 5000)""".stripMargin,
    "q_join_asof" ->
      """SELECT e.event_id, e.user_id, o.o_orderdate AS last_order_ts
        |FROM events e ASOF JOIN orders o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts""".stripMargin,
    "q_agg_stats" ->
      """SELECT count(*) AS n, count(DISTINCT l_orderkey) AS n_orders,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  round(stddev_samp(l_quantity), 6) AS sd_qty, round(var_samp(l_quantity), 6) AS var_qty,
        |  median(l_quantity) AS med_qty
        |FROM lineitem""".stripMargin,
    "q_quantiles" ->
      """SELECT quantile_cont(l_quantity, 0.25) AS q25, quantile_cont(l_quantity, 0.5) AS q50,
        |  quantile_cont(l_quantity, 0.75) AS q75 FROM lineitem""".stripMargin,
    "q_mode" ->
      """SELECT event_type AS mode_value FROM
        |(SELECT event_type, count(*) AS c FROM events GROUP BY 1)
        |QUALIFY row_number() OVER (ORDER BY c DESC, event_type DESC) = 1""".stripMargin,
    "q_value_counts" ->
      "SELECT event_type AS value, count(*) AS n FROM events GROUP BY 1",
    "q_first_last" ->
      """SELECT user_id, min_by(event_type, event_id) AS first_event,
        |  max_by(event_type, event_id) AS last_event, count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q_any_all" ->
      """SELECT user_id, bool_or(value > 100) AS any_high, bool_and(value > 1) AS all_pos
        |FROM events GROUP BY 1""".stripMargin,
    "q_strfns" ->
      """SELECT p_partkey, lower(p_name) AS lname, upper(p_brand) AS ubrand,
        |  substring(p_name, 1, 5) AS pfx, CAST(length(p_name) AS BIGINT) AS len,
        |  replace(p_type, ' ', '_') AS slug, reverse(p_brand) AS rev,
        |  starts_with(p_name, 'a') AS sw, contains(p_name, 'st') AS ct
        |FROM part""".stripMargin,
    "q_regexfns" ->
      """SELECT p_partkey, regexp_extract(p_type, '([a-z]+)$', 1) AS last_word,
        |  regexp_matches(p_type, 'a') AS m,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS novowels
        |FROM part""".stripMargin,
    "q_hashfns" ->
      """SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256,
        |  to_base64(encode(substring(text, 1, 48))) AS b64 FROM documents""".stripMargin,
    "q_timefns" ->
      """SELECT event_id, year(ts) AS yr, month(ts) AS mo, day(ts) AS dom, hour(ts) AS hr,
        |  CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  strftime(ts, '%Y-%m-%d %H') AS fmt,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS unix_s
        |FROM events""".stripMargin,
    "q_timearith" ->
      """SELECT event_id, ts + INTERVAL 7 DAY AS plus7d,
        |  date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', ts) AS min_since
        |FROM events""".stripMargin,
    "q_numfns" ->
      """SELECT event_id, abs(value - 100) AS a, CAST(floor(value) AS BIGINT) AS fl,
        |  CAST(ceil(value) AS BIGINT) AS ce, sqrt(value) AS sq, value * value AS sqr
        |FROM events""".stripMargin,
    "q_bitfns" ->
      """SELECT event_id, event_id & 255 AS b_and, event_id | 16 AS b_or,
        |  xor(event_id, 85) AS b_xor, event_id << 2 AS shl, event_id >> 3 AS shr
        |FROM events""".stripMargin,
    "q_listfns" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_words,
        |  list_contains(string_split(text, ' '), 'data') AS has_data,
        |  array_to_string(string_split(text, ' ')[1:3], ' ') AS first3,
        |  string_split(text, ' ')[2] AS second,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct
        |FROM documents""".stripMargin,
    "q_nullfns" ->
      """SELECT event_id, coalesce(nullif(event_type, 'error'), 'none') AS et,
        |  value / nullif(user_id, 0) AS per_user
        |FROM events""".stripMargin
  )
}
