package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.Pipe._

class PipeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "a", 10.0, Seq("x", "y")),
    (2L, "b", 20.0, Seq("z")),
    (3L, "a", 30.0, Seq.empty[String]),
    (4L, "c", 40.0, Seq("x")),
    (5L, "a", 50.0, Seq("y", "y"))
  ).toDF("id", "k", "v", "tags")

  test("where/select/drop/set/rename compose") {
    val out = df.where_(col("v") > 15).select_("id", "k", "v")
      .set_("v2", col("v") * 2).rename_("key" -> "k").drop_("v")
    assert(out.columns.toSeq == Seq("id", "key", "v2"))
    assert(out.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((2L, "b", 40.0), (3L, "a", 60.0), (4L, "c", 80.0), (5L, "a", 100.0)))
  }

  test("flatten/unflatten roundtrip preserves values") {
    val nested = df.select(struct(col("id").as("x"), struct(col("k").as("kk")).as("inner")).as("s"), col("v"))
    val flat = nested.flatten_("_")
    assert(flat.columns.toSeq == Seq("s_x", "s_inner_kk", "v"))
    val back = flat.unflatten_("_")
    assert(back.schema("s").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    assert(back.select(col("s.x"), col("s.inner.kk"), col("v")).orderBy("x").collect().toSeq ==
      df.select(col("id"), col("k"), col("v")).orderBy("id").collect().toSeq)
  }

  test("unroll explodes lists and drops empty ones") {
    val out = df.unroll_("tags").select_("id", "tags").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "x"), (1L, "y"), (2L, "z"), (4L, "x"), (5L, "y")))
    assert(df.unroll_("tags").count() == 6) // 5L yields y twice
  }

  test("enumerate/slice/taste are deterministic by order keys") {
    val en = df.enumerate_(Seq(col("id").desc), "idx")
    assert(en.filter(col("idx") === 0).head().getLong(0) == 5L)
    val sl = df.slice_(1, 3, Seq(col("id")))
    assert(sl.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    val ta = df.taste_(2, Seq("k"), Seq(col("id")))
    assert(ta.filter(col("k") === "a").select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("head/tail/top/rare with total tiebreak") {
    assert(df.head_(2, Seq(col("v").desc)).select("id").as[Long].collect().toSeq == Seq(5L, 4L))
    assert(df.tail_(2, Seq(col("v")), Seq(col("v").desc)).select("id").as[Long].collect().toSeq == Seq(4L, 5L))
    assert(df.top_("k", 1).as[(String, Long)].collect().toSeq == Seq(("a", 3L)))
    assert(df.rare_("k", 1).as[(String, Long)].collect().toSeq == Seq(("b", 1L)))
  }

  test("deduplicate keeps first limit rows per key") {
    val d1 = df.deduplicate_(Seq("k"), Seq(col("id")))
    assert(d1.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L))
    val d2 = df.deduplicate_(Seq("k"), Seq(col("id")), limit = 2)
    assert(d2.count() == 5 - 1) // only third "a" dropped
  }

  test("ifElse_ routes disjointly and reunions") {
    val out = df.ifElse_(col("k") === "a",
      _.set_("tag", lit("A")), _.set_("tag", lit("other")))
    assert(out.count() == 5)
    assert(out.filter(col("tag") === "A").count() == 3)
  }

  test("enrich_ broadcast-joins a small dimension") {
    val dim = Seq(("a", "alpha"), ("b", "beta")).toDF("k", "full")
    val out = df.enrich_(dim, Seq("k"), "left")
    assert(out.filter(col("full").isNull).count() == 1) // k=c unmatched
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("sample_ is deterministic") {
    val a = df.sample_(0.6, Seq(col("id"))).select("id").as[Long].collect().toSet
    val b = df.sample_(0.6, Seq(col("id"))).select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("assert_ filters and observes dropped count") {
    assert(df.assert_(col("v") < 45).count() == 4)
    // two asserts in ONE query need distinct observation names (Spark
    // rejects duplicate CollectMetrics names) — the default is sequenced
    assert(df.assert_(col("v") < 45).assert_(col("id") > 0).count() == 4)
  }

  test("internal temp columns never clobber same-named user data") {
    val clash = df.withColumn("__rn", lit(9))
    val err = intercept[IllegalArgumentException](
      clash.deduplicate_(Seq("k"), Seq(col("id"))))
    assert(err.getMessage.contains("__rn"))
    intercept[IllegalArgumentException](
      df.withColumn("__pid", lit(1)).enumerate_(Seq(col("id"))))
    intercept[IllegalArgumentException](
      df.withColumn("__b", lit(1)).sampleAdaptive_(
        current_timestamp(), 60, 10, col("id")))
  }

  test("unflatten rejects a plain column colliding with a dotted prefix") {
    val bad = df.select(col("id").as("a"), col("v").as("a.b"))
    val err = intercept[IllegalArgumentException](bad.unflatten_())
    assert(err.getMessage.contains("collides"))
  }

  test("rate samplers: empty periods snap back; null timestamps pass 1:1") {
    import java.sql.Timestamp
    def ts(day: Int): Timestamp = new Timestamp(86400000L * day)
    // period 0: 100 events (> minEvents); period 1: EMPTY; period 2: 40
    // events. The reference derives period 2's rate from its previous
    // period IN TIME (empty → 0 < minEvents → 1:1) — lag over non-empty
    // buckets would sample period 2 at k=floor(ln(100))=4.
    val rows = (0 until 100).map(i => (i.toLong, ts(0))) ++
      (1000 until 1040).map(i => (i.toLong, ts(2)))
    val frame = rows.toDF("eid", "t")
    val kept = frame.sampleRate_(col("t"), 86400, col("eid"), minEvents = 30L)
      .filter(col("t") === ts(2))
    assert(kept.count() == 40, "empty period must snap the rate back to 1:1")
    // period 1 adjacent to period 0 IS governed by period 0's count
    val dense = ((0 until 100).map(i => (i.toLong, ts(0))) ++
      (1000 until 1040).map(i => (i.toLong, ts(1)))).toDF("eid", "t")
    val governed = dense.sampleRate_(col("t"), 86400, col("eid"), minEvents = 30L)
      .filter(col("t") === ts(1)).count()
    assert(governed < 40, "adjacent period must be sampled at k=ln(prev)")
    // null timestamps pass 1:1 and do not feed any period's rate
    val withNulls = (frame.select(col("eid"), col("t")) unionByName
      (2000 until 2200).map(i => (i.toLong, null.asInstanceOf[Timestamp])).toDF("eid", "t"))
    val out = withNulls.sampleRate_(col("t"), 86400, col("eid"), minEvents = 30L)
    assert(out.filter(col("t").isNull).count() == 200)
    assert(out.filter(col("t") === ts(2)).count() == 40) // still 1:1 after the gap
  }
}
