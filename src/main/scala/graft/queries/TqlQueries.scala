package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tql.Tql

/** Driver-checked query catalog, part 6: pipelines expressed as TQL2-subset
  * *strings* and compiled by [[graft.tql.Tql]] to the same Catalyst plans the
  * Scala surface produces (reference grammar:
  * `/root/reference/web/docs/tql2/language/statements.md`). Each query has a
  * DuckDB oracle, so the string→plan compiler itself is under the hard
  * correctness gate, not just ScalaTest.
  */
object TqlQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // where + assignment + summarize + auto/named aggregation names
    "q_tql_summarize" -> ((s, d) =>
      Tql("""
        where l_quantity > 10
        summarize l_returnflag, l_linestatus, n=count(), qty=sum(l_quantity), hi=max(l_extendedprice)
      """)(t(s, d, "lineitem"))),

    // sort (mixed asc/desc) feeding head, with a total tiebreak order
    "q_tql_tophead" -> ((s, d) =>
      Tql("""
        where o_totalprice > 100000.0
        sort -o_totalprice, o_orderkey
        head 50
        select o_orderkey, o_totalprice
      """)(t(s, d, "orders"))),

    // enumerate over an explicit sort + modulo filter + int() cast
    "q_tql_enumerate" -> ((s, d) =>
      Tql("""
        sort o_orderkey | enumerate idx | idx = int(idx)
        where idx % 100 == 0 | select idx, o_orderkey
      """)(t(s, d, "orders"))),

    // group { } subpipeline: per-key top-2 with a total tiebreak order
    "q_tql_group" -> ((s, d) =>
      Tql("""
        group l_returnflag {
          sort -l_quantity, l_orderkey, l_linenumber
          head 2
        }
        select l_returnflag, l_orderkey, l_linenumber, l_quantity
      """)(t(s, d, "lineitem"))),

    // scalar functions, UFCS sugar, arithmetic on key columns
    "q_tql_scalar" -> ((s, d) =>
      Tql("""
        where c_acctbal >= 0.0 and c_name.contains("1")
        name = to_upper(c_name)
        key2 = c_custkey * 2 + 1
        select c_custkey, name, key2
      """)(t(s, d, "customer"))),

    // parse_* statements + namespaced functions under the hard oracle: both
    // engines synthesize the identical syslog line, the TQL string surface
    // parses it back and maps an OCSF uid
    "q_tql_parse" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val line = concat(
        lit("<"), pmod(col("event_id"), lit(192L)).cast("string"), lit(">1 - host"),
        pmod(col("user_id"), lit(50L)).cast("string"),
        lit(" app - - - seen "), col("event_type"))
      val in = t(s, d, "events").select(col("event_id"), line.as("line"))
      Tql("""
        parse_syslog line
        cls = ocsf::class_name(4001 + event_id % 14)
        select event_id, facility, severity, hostname, app_name, message, cls
      """)(in)
    }),

    // a COMPLETE pipeline: from-source + enrich against a registered context
    // + chart aggregation — the full string surface end to end
    "q_tql_pipeline" -> ((s, d) => {
      Tql.registerContext("regions", t(s, d, "region"))
      Tql.run(s, s"""
        from "$d/nation.parquet"
        enrich "regions", r_regionkey=n_regionkey
        chart_bar x=r_name, nations=count(), keysum=sum(n_nationkey)
      """)
    }),

    // if/else-if/else routing: branch-local assignments (else branches lack
    // `boosted` → null via unionByName allowMissingColumns) and a chained
    // else-if, re-joined into one flow (statements.md:35-47)
    "q_tql_if" -> ((s, d) =>
      Tql("""
        if value >= 75.0 {
          sev = "high"
          boosted = value * 2.0
        } else if value >= 25.0 {
          sev = "mid"
        } else {
          sev = "low"
        }
        select event_id, sev, boosted
      """)(t(s, d, "events"))),

    // let bindings: const-evaluated at compile time, chained ($hi uses $lo),
    // referenced in both a predicate and a projected expression
    "q_tql_let" -> ((s, d) =>
      Tql("""
        let $lo = 10.0 * 2.0
        let $hi = $lo + 55.0
        where value >= $lo and value < $hi
        select event_id, value, span = $hi - $lo
      """)(t(s, d, "events"))),

    // @name metadata write + read + filter in the expression surface
    // (expressions.md:107-112)
    "q_tql_meta" -> ((s, d) =>
      Tql("""
        @name = concat("graft.", event_type)
        where @name == "graft.purchase"
        select event_id, name = @name
      """)(t(s, d, "events"))),

    // list lambdas on the string surface (reference where_map.cpp:512-660):
    // where(list, x => …) filters, map(list, x => …) transforms — the body
    // captures an outer event field (lang) beside the lambda parameter
    "q_tql_lambda" -> ((s, d) =>
      Tql("""
        words = where(split(text, " "), w => length(w) >= 6)
        tagged = map(words, w => concat(w, ":", lang))
        joined = join(tagged, " ")
        select doc_id, joined
      """)(t(s, d, "documents"))),

    // context statements end-to-end under the hard oracle: create a lookup
    // table, TTL-update it from the events stream (write_timeout present but
    // un-expirable within a run — the TTL columns flow through the liveness
    // filter deterministically), erase a key slice, then enrich. The
    // within-update winner per key is the GREATEST value (the documented
    // deterministic tiebreak), which the oracle reproduces as max().
    "q_tql_context" -> ((s, d) => {
      Tql.ctxClearAll()
      val ev = t(s, d, "events")
      Tql("""
        context::create_lookup_table "q5ctx"
        context::update "q5ctx", key=user_id % 50, value=event_type, write_timeout=365d
      """)(ev)
      Tql("""context::erase "q5ctx", key=user_id % 50""")(
        ev.filter(pmod(col("user_id"), lit(50)) < 10))
      Tql("""
        context::enrich "q5ctx", key=user_id % 50, into=tag
        select event_id, tag
      """)(ev)
    }),

    // import/export: the store round-trip in the STRING surface — pipe the
    // change envelope into a scratch lake, read it back LWW-resolved with
    // time travel defaulting to head, filter + project in TQL
    "q_tql_lake" -> ((s, d) => {
      val work = s"${System.getProperty("java.io.tmpdir")}/graft-q-tql-lake"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
      val env = MLQueries.envelope(t(s, d, "events")) // ONE envelope definition
      Tql(s"""import "$work/lake"""")(env)
      // the import seam stamped @import_time into the lake; export surfaces
      // it per row — assert it is a real recent timestamp (deterministically)
      Tql(s"""
        export "$work/lake"
        where lang == "purchase"
        it_ok = year(@import_time) >= 2020
        select url, text, lang, it_ok
      """)(env)
    }))

  val oracleSql: Map[String, String] = Map(
    "q_tql_if" ->
      """SELECT event_id,
           CASE WHEN value >= 75.0 THEN 'high'
                WHEN value >= 25.0 THEN 'mid' ELSE 'low' END AS sev,
           CASE WHEN value >= 75.0 THEN value * 2.0 END AS boosted
         FROM events""",
    "q_tql_let" ->
      """SELECT event_id, value, CAST(55.0 AS DOUBLE) AS span
         FROM events WHERE value >= 20.0 AND value < 75.0""",
    "q_tql_meta" ->
      """SELECT event_id, 'graft.purchase' AS name
         FROM events WHERE event_type = 'purchase'""",
    "q_tql_context" ->
      """WITH ctx AS (SELECT user_id % 50 AS k, max(event_type) AS tag
           FROM events GROUP BY 1),
         kept AS (SELECT * FROM ctx WHERE k >= 10)
         SELECT e.event_id, kept.tag
         FROM events e LEFT JOIN kept ON e.user_id % 50 = kept.k""",
    "q_tql_lambda" ->
      """SELECT doc_id, CASE WHEN text IS NULL THEN NULL ELSE coalesce(array_to_string(
           list_transform(list_filter(string_split(text, ' '), w -> len(w) >= 6),
                          w -> w || ':' || lang), ' '), '') END AS joined
         FROM documents""",
    "q_tql_summarize" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, sum(l_quantity) AS qty,
         max(l_extendedprice) AS hi
         FROM lineitem WHERE l_quantity > 10 GROUP BY 1, 2""",
    "q_tql_tophead" ->
      """SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100000.0
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""",
    "q_tql_enumerate" ->
      """SELECT idx, o_orderkey FROM (
           SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS idx, o_orderkey FROM orders
         ) WHERE idx % 100 = 0""",
    "q_tql_group" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity FROM (
           SELECT *, row_number() OVER (
             PARTITION BY l_returnflag
             ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn
           FROM lineitem
         ) WHERE rn <= 2""",
    "q_tql_scalar" ->
      """SELECT c_custkey, upper(c_name) AS name, c_custkey * 2 + 1 AS key2
         FROM customer WHERE c_acctbal >= 0.0 AND contains(c_name, '1')""",
    "q_tql_pipeline" ->
      """SELECT r_name, count(*) AS nations, CAST(sum(n_nationkey) AS BIGINT) AS keysum
         FROM nation LEFT JOIN region ON r_regionkey = n_regionkey
         GROUP BY 1 ORDER BY 1 LIMIT 100000""",
    // import→export must equal the LWW winner state, filtered
    "q_tql_lake" ->
      """SELECT concat('u', CAST(user_id AS VARCHAR)) AS url,
        |  max_by(props, event_id) AS text, max_by(event_type, event_id) AS lang,
        |  TRUE AS it_ok
        |FROM events GROUP BY 1
        |HAVING max_by(CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END, event_id) <> 'D'
        |   AND max_by(event_type, event_id) = 'purchase'""".stripMargin,
    "q_tql_parse" -> {
      val caseArms = graft.functions.Ocsf.classes
        .filter(c => c._2 >= 4001L && c._2 <= 4014L).toSeq.sortBy(_._2)
        .map { case (n, id) => s"WHEN $id THEN '$n'" }.mkString(" ")
      s"""SELECT event_id,
         |  (event_id % 192) // 8 AS facility,
         |  (event_id % 192) % 8 AS severity,
         |  concat('host', CAST(user_id % 50 AS VARCHAR)) AS hostname,
         |  'app' AS app_name,
         |  concat('seen ', event_type) AS message,
         |  CASE 4001 + event_id % 14 $caseArms END AS cls
         |FROM events""".stripMargin
    })
}
