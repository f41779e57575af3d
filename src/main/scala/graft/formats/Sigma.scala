package graft.formats

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Sigma rule → Catalyst predicate compiler: the reference's declarative
  * rule→expression showcase re-expressed against DataFrame columns. A rule's
  * `detection` block is a set of named search-identifiers plus a boolean
  * `condition` over them; the compiled output is one `Column` predicate that
  * pushes down and codegens like any hand-written filter.
  *
  * Reference: `/root/reference/plugins/sigma/src/parse.cpp:492-540`
  * (`parse_rule`: named sub-expressions + condition parser) and the public
  * Sigma specification's field modifiers.
  *
  * Supported surface: map search-ids (field[:modifier] → value or value
  * list, list = OR within the field, fields AND'ed), list search-ids (OR of
  * keyword terms over a `raw` column), modifiers `contains`, `startswith`,
  * `endswith`, `re`, `lt/lte/gt/gte`, `cased`; condition grammar with
  * `and`/`or`/`not`, parentheses, `all of them`, `1 of them`,
  * `all of <prefix>*`, `1 of <prefix>*`.
  */
object Sigma {

  /** Compile the YAML text of a sigma rule into a predicate over `fieldCol`
    * (maps a sigma field name to the Column holding it; `raw` receives
    * keyword searches).
    */
  def compile(ruleYaml: String, fieldCol: String => Column): Column = {
    val docs = Yaml.yamlDocsToJson(ruleYaml)
    require(docs.nonEmpty, "empty sigma rule")
    val root = com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .readTree(docs.head)
    val detection = root.get("detection")
    require(detection != null && detection.isObject, "rule has no detection block")
    val it = detection.fields()
    var searches = Map.empty[String, Column]
    var condition: String = null
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey == "condition") condition = e.getValue.asText()
      else searches += e.getKey -> compileSearch(e.getValue, fieldCol)
    }
    require(condition != null, "rule has no condition")
    new ConditionParser(condition, searches).parse()
  }

  /** One named search-identifier → predicate. */
  private def compileSearch(node: com.fasterxml.jackson.databind.JsonNode,
      fieldCol: String => Column): Column =
    if (node.isObject) {
      // map: every field matches (AND); a list value = any-of (OR)
      val it = node.fields()
      var conjuncts = List.empty[Column]
      while (it.hasNext) {
        val e = it.next()
        val (field, modifier) = e.getKey.split("\\|", 2) match {
          case Array(f) => (f, "")
          case Array(f, m) => (f, m)
        }
        val values: Seq[com.fasterxml.jackson.databind.JsonNode] =
          if (e.getValue.isArray) {
            val b = scala.collection.mutable.ArrayBuffer.empty[com.fasterxml.jackson.databind.JsonNode]
            e.getValue.forEach(v => b += v)
            b.toSeq
          } else Seq(e.getValue)
        val c = fieldCol(field)
        conjuncts ::= values.map(v => matchOne(c, v, modifier)).reduce(_ || _)
      }
      conjuncts.reduce(_ && _)
    } else if (node.isArray) {
      // list: keyword search over the raw event (OR)
      val b = scala.collection.mutable.ArrayBuffer.empty[Column]
      node.forEach(v => b += fieldCol("raw").contains(v.asText()))
      b.reduce(_ || _)
    } else fieldCol("raw").contains(node.asText())

  /** One (field, value, modifier) leaf. Sigma matches are case-insensitive
    * unless `cased`; `*`/`?` wildcards in plain values become SQL LIKE.
    */
  private def matchOne(c: Column, v: com.fasterxml.jackson.databind.JsonNode,
      modifier: String): Column = {
    def ci(x: Column): Column = lower(x)
    val s = v.asText()
    modifier match {
      case "" if v.isNumber => c === v.asDouble()
      case "" if v.isNull => c.isNull
      case "" if s.contains("*") || s.contains("?") =>
        ci(c).like(s.toLowerCase.replace("%", "\\%").replace("_", "\\_")
          .replace('*', '%').replace('?', '_'))
      case "" => ci(c) === s.toLowerCase
      case "cased" => c === s
      case "contains" => ci(c).contains(s.toLowerCase)
      case "startswith" => ci(c).startsWith(s.toLowerCase)
      case "endswith" => ci(c).endsWith(s.toLowerCase)
      case "re" => c.rlike(s)
      case "lt" => c < v.asDouble()
      case "lte" => c <= v.asDouble()
      case "gt" => c > v.asDouble()
      case "gte" => c >= v.asDouble()
      case other => sys.error(s"unsupported sigma modifier |$other")
    }
  }

  /** Recursive-descent parser for the condition grammar:
    * `expr := conj ('or' conj)*`, `conj := term ('and' term)*`,
    * `term := 'not' term | '(' expr ')' | quantifier 'of' selector | ident`
    * — `and` binds tighter than `or`, per the sigma spec (pySigma grammar):
    * `a or b and c` parses as `a or (b and c)`.
    */
  private final class ConditionParser(input: String, searches: Map[String, Column]) {
    private val tokens: Seq[String] =
      input.replace("(", " ( ").replace(")", " ) ").trim.split("\\s+").toSeq
    private var pos = 0
    private def peek: Option[String] = tokens.lift(pos)
    private def next(): String = { val t = tokens(pos); pos += 1; t }

    def parse(): Column = {
      val c = expr()
      require(pos == tokens.size, s"trailing tokens in condition: $input")
      c
    }

    private def expr(): Column = {
      var left = conj()
      while (peek.contains("or")) { next(); left = left || conj() }
      left
    }

    private def conj(): Column = {
      var left = term()
      while (peek.contains("and")) { next(); left = left && term() }
      left
    }

    private def term(): Column = peek match {
      case Some("not") => next(); !term()
      case Some("(") =>
        next(); val c = expr(); require(next() == ")", "missing )"); c
      case Some(q @ ("all" | "1")) =>
        next(); require(next() == "of", s"expected 'of' after $q")
        val sel = next()
        val matched =
          if (sel == "them") searches.values.toSeq
          else {
            require(sel.endsWith("*"), s"selector must be 'them' or a prefix*: $sel")
            val prefix = sel.stripSuffix("*")
            searches.collect { case (k, v) if k.startsWith(prefix) => v }.toSeq
          }
        require(matched.nonEmpty, s"no search identifiers match $sel")
        if (q == "all") matched.reduce(_ && _) else matched.reduce(_ || _)
      case Some(id) =>
        next()
        searches.getOrElse(id, sys.error(s"unknown search identifier '$id'"))
      case None => sys.error("empty condition")
    }
  }
}
