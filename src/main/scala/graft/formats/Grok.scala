package graft.formats

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Grok pattern compiler: `%{SYNTAX[:SEMANTIC[:CONVERSION]]}` replacement
  * fields expanded against a pattern library into ONE Java regex, evaluated
  * with codegen'd `regexp_extract` per named field — no UDFs.
  *
  * Reference: `/root/reference/libtenzir/builtins/formats/grok.cpp` (pattern
  * resolution + capture collection), docs `web/docs/formats/grok.md`
  * (`SYNTAX:SEMANTIC:CONVERSION`, `--pattern-definitions`). The built-in
  * library below is a curated core of the public Logstash
  * `logstash-patterns-core` definitions (Apache-2.0) that the reference also
  * ships; the expansion/compilation here is original.
  *
  * Capture-group indexing: Spark's `regexp_extract` addresses groups by
  * NUMBER, so the compiler tracks the index of every capturing group while
  * expanding — `%{NAME:field}` bodies are wrapped in a capturing group whose
  * index is recorded, `%{NAME}` bodies in a non-capturing one, and raw `(`
  * groups inside pattern bodies are counted (character-class and escape
  * aware) so indices stay correct.
  */
object Grok {

  /** Core built-in patterns (public Logstash pattern set). */
  val BuiltIn: Map[String, String] = Map(
    "USERNAME" -> """[a-zA-Z0-9._-]+""",
    "USER" -> """%{USERNAME}""",
    "INT" -> """(?:[+-]?(?:[0-9]+))""",
    "NONNEGINT" -> """\b(?:[0-9]+)\b""",
    "POSINT" -> """\b(?:[1-9][0-9]*)\b""",
    "WORD" -> """\b\w+\b""",
    "NOTSPACE" -> """\S+""",
    "SPACE" -> """\s*""",
    "DATA" -> """.*?""",
    "GREEDYDATA" -> """.*""",
    // RE2-safe number (the classic BASE10NUM uses lookbehind; this core set
    // stays lookaround-free so DuckDB oracles can run the same regex)
    "BASE10NUM" -> """(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?|\.[0-9]+))""",
    "NUMBER" -> """(?:%{BASE10NUM})""",
    "BASE16NUM" -> """(?:[+-]?(?:0x)?(?:[0-9A-Fa-f]+))""",
    "UUID" -> """[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}""",
    "IPV4" -> """(?:(?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.](?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.](?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.](?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5]))""",
    "IP" -> """(?:%{IPV4})""",
    "HOSTNAME" -> """\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*(?:\.?|\b)""",
    "IPORHOST" -> """(?:%{IP}|%{HOSTNAME})""",
    "HOSTPORT" -> """%{IPORHOST}:%{POSINT}""",
    "UNIXPATH" -> """(?:/[\w_%!$@:.,+~-]*)+""",
    "URIPROTO" -> """[A-Za-z](?:[A-Za-z0-9+\-.]+)+""",
    "URIHOST" -> """%{IPORHOST}(?::%{POSINT})?""",
    "URIPATH" -> """(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+""",
    "URIQUERY" -> """[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*""",
    "URIPARAM" -> """\?%{URIQUERY}""",
    "URIPATHPARAM" -> """%{URIPATH}(?:\?%{URIQUERY})?""",
    "URI" -> """%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATH}(?:\?%{URIQUERY})?)?""",
    "MONTHNUM" -> """(?:0?[1-9]|1[0-2])""",
    "MONTHDAY" -> """(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])""",
    "YEAR" -> """(?:\d\d){1,2}""",
    "HOUR" -> """(?:2[0123]|[01]?[0-9])""",
    "MINUTE" -> """(?:[0-5][0-9])""",
    "SECOND" -> """(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)""",
    "TIME" -> """(?:%{HOUR}:%{MINUTE}(?::%{SECOND})?)""",
    "DATE_US" -> """%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}""",
    "DATE_EU" -> """%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}""",
    "ISO8601_TIMEZONE" -> """(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))""",
    "TIMESTAMP_ISO8601" -> """%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?""",
    "MONTH" -> """\b(?:[Jj]an(?:uary|uar)?|[Ff]eb(?:ruary|ruar)?|[Mm](?:a|ä)?r(?:ch|z)?|[Aa]pr(?:il)?|[Mm]a(?:y|i)?|[Jj]un(?:e|i)?|[Jj]ul(?:y|i)?|[Aa]ug(?:ust)?|[Ss]ep(?:tember)?|[Oo](?:c|k)?t(?:ober)?|[Nn]ov(?:ember)?|[Dd]e(?:c|z)(?:ember)?)\b""",
    "SYSLOGTIMESTAMP" -> """%{MONTH} +%{MONTHDAY} %{TIME}""",
    "PROG" -> """[\x21-\x5a\x5c\x5e-\x7e]+""",
    "SYSLOGPROG" -> """%{PROG:program}(?:\[%{POSINT:pid}\])?""",
    "HTTPDATE" -> """%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}""",
    "QS" -> """(?:"(?:[^"\\]|\\.)*")""",
    "LOGLEVEL" -> """(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo(?:rmation)?|INFO(?:RMATION)?|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)""",
    "COMMONAPACHELOG" -> """%{IPORHOST:clientip} %{USER:ident} %{USER:auth} \[%{HTTPDATE:timestamp}\] "(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})" %{NONNEGINT:response} (?:%{NONNEGINT:bytes}|-)""")

  /** One named capture: output field name, capture-group index in the
    * compiled regex, and conversion (`string` | `int` | `float`).
    */
  case class Field(name: String, group: Int, conv: String)

  /** A compiled grok expression. */
  case class Compiled(regex: String, fields: Seq[Field]) {
    /** Columns extracting every named field from `line` (null when the line
      * does not match the pattern — distinguishes no-match from empty
      * capture).
      */
    def columns(line: Column): Seq[Column] = {
      val matches = line.rlike(regex)
      fields.map { f =>
        val raw = when(matches, regexp_extract(line, regex, f.group))
        (f.conv match {
          case "int" => raw.cast("long")
          case "float" => raw.cast("double")
          case _ => raw
        }).as(f.name)
      }
    }
  }

  private val Ref = """%\{(\w+)(?::([\w.\[\]@-]+))?(?::(\w+))?\}""".r

  /** Count capturing groups in a raw regex fragment: `(` that is not escaped,
    * not inside a character class, and not a `(?:`/`(?=`/`(?!`/`(?<=`/`(?<!`
    * construct; `(?<name>` IS capturing.
    */
  private[graft] def countCaptures(s: String): Int = {
    var i = 0; var n = 0; var inClass = false
    while (i < s.length) {
      s(i) match {
        case '\\' => i += 1
        case '[' if !inClass => inClass = true
        case ']' if inClass => inClass = false
        case '(' if !inClass =>
          if (i + 1 >= s.length || s(i + 1) != '?') n += 1
          else if (i + 2 < s.length && s(i + 2) == '<' &&
            i + 3 < s.length && s(i + 3) != '=' && s(i + 3) != '!') n += 1
        case _ =>
      }
      i += 1
    }
    n
  }

  /** Parse user-supplied `--pattern-definitions` text (NAME space PATTERN per
    * line, `#` comments).
    */
  def parseDefinitions(text: String): Map[String, String] =
    text.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sp = l.indexOf(' ')
        require(sp > 0, s"bad pattern definition: $l")
        l.substring(0, sp) -> l.substring(sp + 1)
      }.toMap

  /** Compile a grok expression against the built-in + extra pattern library.
    * Driver-side, once per query — the result is a plain regex usable from
    * any engine with group-index extraction.
    */
  def compile(pattern: String, extra: Map[String, String] = Map.empty): Compiled = {
    val lib = BuiltIn ++ extra
    val out = new StringBuilder
    val fields = scala.collection.mutable.ArrayBuffer.empty[Field]
    var groups = 0

    def emitRaw(s: String): Unit = { groups += countCaptures(s); out.append(s) }

    def expand(p: String, depth: Int): Unit = {
      require(depth < 20, s"grok pattern recursion too deep (cycle?): $pattern")
      var last = 0
      for (m <- Ref.findAllMatchIn(p)) {
        emitRaw(p.substring(last, m.start))
        val name = m.group(1)
        val semantic = Option(m.group(2))
        val conv = Option(m.group(3)).getOrElse("string")
        val body = lib.getOrElse(name, sys.error(s"unknown grok pattern %{$name}"))
        semantic match {
          case Some(fieldName) =>
            groups += 1
            fields += Field(fieldName, groups, conv)
            out.append('(')
            expand(body, depth + 1)
            out.append(')')
          case None =>
            out.append("(?:")
            expand(body, depth + 1)
            out.append(')')
        }
        last = m.end
      }
      emitRaw(p.substring(last))
    }

    expand(pattern, 0)
    // sanity: the expansion must be a valid Java regex
    java.util.regex.Pattern.compile(out.toString)
    Compiled(out.toString, fields.toSeq)
  }
}
