package graft

import org.apache.spark.sql.functions._

import graft.lake.ExactPartition
import graft.ops.Contexts

class ContextsSpec extends SparkSpec {
  import spark.implicits._

  test("bloom: no false negatives; deterministic over rebuilds") {
    val keys = (0 until 500).map(i => s"key$i").toDF("k")
    val bf = Contexts.bloomBuild(keys, col("k"), mBits = 8192)
    val bf2 = Contexts.bloomBuild(keys, col("k"), mBits = 8192)
    assert(bf.words.toSeq == bf2.words.toSeq) // build is deterministic
    val probe = ((0 until 500).map(i => s"key$i") ++ (0 until 500).map(i => s"miss$i")).toDF("k")
    val res = probe.select(col("k"), bf.mightContain(col("k")).as("in")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert((0 until 500).forall(i => res(s"key$i")), "bloom false negative")
    // false positives allowed but must be a minority at this sizing
    val fp = (0 until 500).count(i => res(s"miss$i"))
    assert(fp < 250, s"fp rate implausible: $fp/500")
  }

  test("TTL lookup: entries expire relative to the probing event's time") {
    val ctx = Seq(
      (1L, "alice", "2024-01-01 00:00:00", "2024-01-05 00:00:00"),
      (2L, "bob", "2024-02-01 00:00:00", "2024-02-01 00:00:00"))
      .toDF("id", "name", "c", "u")
      .select(col("id"), col("name"),
        col("c").cast("timestamp_ntz").as("created_ts"),
        col("u").cast("timestamp_ntz").as("updated_ts"))
    val events = Seq(
      (10L, 1L, "2024-01-02 00:00:00"), // live
      (11L, 1L, "2024-01-20 00:00:00"), // past create-timeout
      (12L, 2L, "2024-02-02 00:00:00"), // live
      (13L, 3L, "2024-01-02 00:00:00")) // no entry
      .toDF("ev", "id", "t").select(col("ev"), col("id"), col("t").cast("timestamp_ntz").as("t"))
    val out = Contexts.enrichWithTtl(events, ctx, Seq("id"), col("t"),
      createTimeoutSec = Some(10L * 86400), updateTimeoutSec = Some(30L * 86400))
      .select("ev", "name").as[(Long, Option[String])].collect().toMap
    assert(out(10L).contains("alice"))
    assert(out(11L).isEmpty) // expired → enriches as null, row kept
    assert(out(12L).contains("bob"))
    assert(out(13L).isEmpty)
  }

  test("subnet enrichment picks the longest matching prefix") {
    val ctx = Seq(
      ("10.0.0.0/8", "wide"), ("10.5.0.0/16", "mid"), ("10.5.1.0/24", "narrow"),
      ("0.0.0.0/0", "default")).toDF("cidr", "tag")
    val ev = Seq(
      (1L, "10.5.1.7"), // narrow
      (2L, "10.5.2.7"), // mid
      (3L, "10.9.9.9"), // wide
      (4L, "192.168.0.1")) // default
      .toDF("id", "ip")
    val out = Contexts.enrichLongestPrefix(ev, "id", col("ip"), ctx)
      .select("id", "tag", "prefix_len").as[(Long, String, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ("narrow", 24))
    assert(out(2L) == ("mid", 16))
    assert(out(3L) == ("wide", 8))
    assert(out(4L) == ("default", 0))
  }

  test("ExactPartition: preimage keys land every slot exactly; bySlot balances") {
    for (n <- Seq(2, 7, 16, 32, 64)) {
      val keys = ExactPartition.keysFor(n)
      assert(keys.length == n)
    }
    // 64 buckets into 16 slots → exactly 4 buckets per partition
    val df = spark.range(64 * 100).select((col("id") % 64).as("b"))
    val routed = graft.lake.ExactPartition.bySlot(df, 16, pmod(col("b"), lit(16)))
    val sizes = routed.groupBy(spark_partition_id().as("p")).count()
      .collect().map(_.getLong(1))
    assert(sizes.length == 16)
    assert(sizes.forall(_ == 400L), s"unbalanced: ${sizes.toSeq}")
  }
}
