package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The `python` escape hatch (reference
  * `/root/reference/libtenzir/builtins/operators/python.cpp`: runs user
  * Python per event with the event bound as `self`). Spark mapping: one
  * python3 subprocess per PARTITION (not per row), fed NDJSON over
  * stdin/stdout via [[Shell]]'s streaming plumbing — the same
  * interpreter-per-pipeline cost model as the reference, scaled out by
  * partition count. The user code sees the event as the dict `event`; it may
  * mutate fields, add new ones, or set `event = None` to drop the row.
  * Output rows are re-parsed against the declared schema, so the escape
  * hatch composes with the surrounding Catalyst plan (and everything
  * downstream stays codegen'd).
  *
  * Doubles survive the round trip exactly: Spark's JSON writer and Python's
  * `repr` both emit shortest-round-trip forms, and both parsers read back
  * the identical IEEE value.
  */
object Python {

  /** stdin/stdout NDJSON harness. The user code arrives via argv — never
    * spliced into the harness source — so there is no quoting surface.
    */
  private val Harness =
    """import sys, json, math
      |_code = compile(sys.argv[1], '<python-op>', 'exec')
      |for _line in sys.stdin:
      |    _g = {'json': json, 'math': math, 'event': json.loads(_line)}
      |    exec(_code, _g)
      |    if _g['event'] is not None:
      |        sys.stdout.write(json.dumps(_g['event'], separators=(',', ':')) + '\n')
      |""".stripMargin

  /** Run `code` once per row of `df`; returns rows shaped by `outSchema`.
    * Null input fields are serialized explicitly (JSON null) so the code
    * always sees every column key.
    */
  def python_(df: DataFrame, code: String, outSchema: StructType): DataFrame = {
    // backtick-quote: dotted top-level names (flattened frames) must not
    // resolve as nested-field paths
    val ndjson = df.select(to_json(struct(df.columns.map(n => col(s"`$n`")).toIndexedSeq: _*),
      Map("ignoreNullFields" -> "false")).as("line"))
    // strict exit contract: ANY non-zero status (an uncaught user exception)
    // fails the task with the traceback — never a silently truncated partition
    val out = Shell.shell_(ndjson, "line", Seq("python3", "-c", Harness, code),
      okExit = Set(0))
    out.select(from_json(col("line"), outSchema).as("e")).select(col("e.*"))
  }
}
