package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Pipe._
import graft.tql.Tql

/** Property-based TQL fuzzing (ScalaCheck generators, deterministic seeds —
  * something the reference's test suite lacks; SURVEY §5):
  *
  *  1. '''parser totality''': a grammar-aware generator (plus token-level
  *     mutations: deletions, insertions, duplications) must drive the
  *     compiler into either success or a NAMED error — never a MatchError,
  *     NPE, stack overflow, or a message-less crash;
  *  2. '''plan identity''': pipelines drawn from the translatable subset
  *     compile to the IDENTICAL canonicalized optimized plan as their
  *     programmatically built Scala twins.
  */
class TqlPropertySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "alpha", "GET", 200L, 1.5),
    (2L, "beta", "POST", 404L, 2.5),
    (3L, "alpha", "GET", 200L, 3.0),
    (4L, "gamma", "PUT", 500L, 0.5)
  ).toDF("id", "user", "method", "status", "value")

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  // ------------------------------------------------------- grammar generator

  private val field = Gen.oneOf("id", "user", "method", "status", "value",
    "nope", "x1") // includes unknown fields: analysis errors are NAMED errors
  private val numLit = Gen.choose(-100, 1000).map(_.toString)
  private val strLit = Gen.oneOf("\"GET\"", "\"a b\"", "\"\"", "\"x\\ny\"")

  private def numExpr(depth: Int): Gen[String] =
    if (depth <= 0) Gen.oneOf(field, numLit)
    else Gen.frequency(
      3 -> field, 3 -> numLit,
      2 -> (for { a <- numExpr(depth - 1); op <- Gen.oneOf("+", "-", "*", "/", "%");
                  b <- numExpr(depth - 1) } yield s"($a $op $b)"),
      1 -> field.map(f => s"length($f)"),
      1 -> field.map(f => s"abs($f)"))

  private def boolExpr(depth: Int): Gen[String] =
    if (depth <= 0)
      for { a <- numExpr(0); op <- Gen.oneOf("==", "!=", "<", "<=", ">", ">=");
            b <- Gen.oneOf(numLit, strLit) } yield s"$a $op $b"
    else Gen.frequency(
      3 -> boolExpr(0),
      1 -> (for { a <- boolExpr(depth - 1); op <- Gen.oneOf("and", "or");
                  b <- boolExpr(depth - 1) } yield s"($a $op $b)"),
      1 -> boolExpr(depth - 1).map(e => s"not ($e)"),
      1 -> field.map(f => s"$f.contains(\"a\")"))

  private val statement: Gen[String] = Gen.frequency(
    3 -> boolExpr(2).map(e => s"where $e"),
    2 -> Gen.someOf(Seq("id", "user", "status", "value")).map(fs =>
      s"select ${if (fs.isEmpty) "id" else fs.mkString(", ")}"),
    2 -> (for { f <- Gen.identifier.map(_.take(6)); e <- numExpr(2) } yield s"$f = $e"),
    1 -> field.map(f => s"drop $f"),
    1 -> (for { a <- Gen.identifier.map(_.take(6)); b <- field } yield s"rename $a=$b"),
    1 -> (for { neg <- Gen.oneOf("", "-"); f <- field } yield s"sort $neg$f"),
    1 -> Gen.choose(1, 20).map(n => s"head $n"),
    1 -> Gen.choose(1, 20).map(n => s"tail $n"), // without a sort → named error
    1 -> Gen.const("summarize method, n=count(), hi=max(value)"),
    1 -> (for { f <- Gen.identifier.map(_.take(6)); e <- numExpr(1) } yield
      s"$f = map(split(user, \" \"), w => concat(w, \"x\"))"),
    1 -> boolExpr(1).map(e => s"assert $e"),
    1 -> Gen.const("enumerate idx"), // without a sort → named error
    1 -> (for { lo <- Gen.choose(-5, 5); hi <- Gen.choose(-5, 5) } yield
      s"slice $lo:$hi"))

  private val program: Gen[String] =
    for {
      n <- Gen.choose(1, 5)
      stmts <- Gen.listOfN(n, statement)
      sep <- Gen.oneOf("\n", " | ")
    } yield stmts.mkString(sep)

  /** Token-level corruption: delete a span, insert a random punct, or
    * duplicate a chunk — the near-miss space where unguarded parsers crash. */
  private val corrupted: Gen[String] =
    for {
      base <- program
      kind <- Gen.choose(0, 2)
      at <- Gen.choose(0, math.max(0, base.length - 1))
      len <- Gen.choose(1, 4)
      tok <- Gen.oneOf("::", "=>", "{", "}", "(", ")", "$", "@", ",", "==", "|", "\"")
    } yield kind match {
      case 0 => base.patch(at, "", math.min(len, base.length - at))
      case 1 => base.patch(at, tok, 0)
      case _ => base.patch(at, base.slice(at, math.min(base.length, at + len)), 0)
    }

  private def mustBeNamed(prog: String): Unit =
    try {
      val out = Tql(prog)(df)
      out.queryExecution.optimizedPlan // force analysis
      ()
    } catch {
      case e @ (_: MatchError | _: NullPointerException | _: NotImplementedError) =>
        fail(s"parser crash (${e.getClass.getSimpleName}) on:\n$prog", e)
      case e: StackOverflowError =>
        fail(s"parser stack overflow on:\n$prog")
      case e: Throwable =>
        assert(Option(e.getMessage).exists(_.nonEmpty),
          s"message-less ${e.getClass.getName} on:\n$prog")
    }

  test("totality: 800 grammar-drawn pipelines compile or fail with a named error") {
    (1 to 800).foreach(i => mustBeNamed(sample(program, 1000L + i)))
  }

  test("totality: 400 corrupted pipelines never crash the parser") {
    (1 to 400).foreach(i => mustBeNamed(sample(corrupted, 9000L + i)))
  }

  // ------------------------------------------------ plan identity vs twins

  private case class Twin(tql: String, hand: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)

  private val twin: Gen[Twin] = Gen.oneOf(
    Gen.choose(100, 600).map(n => Twin(s"where status >= $n",
      d => d.where_(org.apache.spark.sql.functions.col("status") >= n))),
    Gen.choose(0.0, 3.0).map(v => Twin(s"where value > $v and status == 200",
      d => d.where_(org.apache.spark.sql.functions.col("value") > v &&
        org.apache.spark.sql.functions.col("status") === 200))),
    Gen.const(Twin("select id, user, value",
      d => d.select_("id", "user", "value"))),
    Gen.choose(1, 9).map(k => Twin(s"boosted = value * $k + 1",
      d => d.set_("boosted", org.apache.spark.sql.functions.col("value") * k + 1))),
    Gen.const(Twin("drop method",
      d => d.drop_("method"))),
    Gen.const(Twin("rename who=user",
      d => d.rename_("who" -> "user"))),
    Gen.const(Twin("upper = to_upper(user)",
      d => d.set_("upper", org.apache.spark.sql.functions.upper(
        org.apache.spark.sql.functions.col("user"))))))

  private val twinChain: Gen[Seq[Twin]] = for {
    n <- Gen.choose(1, 4)
    ts <- Gen.listOfN(n, twin)
  } yield ts

  test("plan identity: 300 translatable chains equal their Scala twins' optimized plans") {
    (1 to 300).foreach { i =>
      val chain = sample(twinChain, 5000L + i)
      // a twin may reference a column an earlier twin dropped/renamed —
      // both sides then fail identically; only compare when BOTH analyze
      val tqlProg = chain.map(_.tql).mkString("\n")
      val got = try Some(Tql(tqlProg)(df)) catch { case _: Throwable => None }
      val want = try {
        val d = chain.foldLeft(df)((d, t) => t.hand(d))
        d.queryExecution.optimizedPlan // force
        Some(d)
      } catch { case _: Throwable => None }
      (got, want) match {
        case (Some(g), Some(w)) =>
          val gp = try Some(g.queryExecution.optimizedPlan.canonicalized)
            catch { case _: Throwable => None }
          (gp, Some(w.queryExecution.optimizedPlan.canonicalized)) match {
            case (Some(a), Some(b)) =>
              assert(a == b, s"plan divergence for:\n$tqlProg\n--- tql:\n$a\n--- twin:\n$b")
            case _ => ()
          }
        case (None, Some(_)) => fail(s"tql failed where the twin analyzed:\n$tqlProg")
        case _ => () // twin failed: both sides reject (unknown column etc.)
      }
    }
  }
}
