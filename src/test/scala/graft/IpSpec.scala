package graft

import org.apache.spark.sql.functions._

import graft.functions.Ip

class IpSpec extends SparkSpec {
  import spark.implicits._

  test("isV4 / network / cidrContains / isPrivate") {
    val df = Seq(
      ("10.5.1.9", true, true),
      ("192.168.100.200", true, true),
      ("172.16.0.1", true, true),
      ("172.32.0.1", true, false),
      ("8.8.8.8", true, false),
      ("256.1.1.1", false, false),
      ("not-an-ip", false, false)
    ).toDF("ip", "v4", "priv")
    val out = df.select(col("ip"), col("v4"), col("priv"),
      Ip.isV4(col("ip")).as("gv4"),
      Ip.isPrivate(col("ip")).as("gpriv"))
    out.collect().foreach { r =>
      assert(r.getBoolean(1) == r.getBoolean(3), s"isV4 ${r.getString(0)}")
      if (r.getBoolean(1)) // valid v4: defined result
        assert(r.getBoolean(2) == r.getBoolean(4), s"isPrivate ${r.getString(0)}")
      else // malformed: null, never an ANSI cast error
        assert(r.isNullAt(4), s"isPrivate ${r.getString(0)}")
    }
    val net = Seq(("10.5.129.9", 17)).toDF("ip", "len")
      .select(Ip.network(col("ip"), col("len"))).as[String].head()
    assert(net == "10.5.128.0")
    val contains = Seq(("10.5.0.0/16", "10.5.7.9", true),
      ("10.5.0.0/16", "10.6.7.9", false), ("0.0.0.0/0", "8.8.8.8", true))
      .toDF("cidr", "ip", "want")
      .select(Ip.cidrContains(col("cidr"), col("ip")) === col("want"))
      .as[Boolean].collect()
    assert(contains.forall(identity))
  }

  test("communityId matches the public spec test vectors and is direction-invariant") {
    // vectors from the public community-id spec (corelight/community-id-spec)
    val flows = Seq(
      ("128.232.110.120", "66.35.250.204", 34855, 80, 6, "1:LQU9qZlK+B5F3KDmev6m5PMibrg="),
      ("66.35.250.204", "128.232.110.120", 80, 34855, 6, "1:LQU9qZlK+B5F3KDmev6m5PMibrg="),
      ("192.168.1.52", "8.8.8.8", 54585, 53, 17, "1:d/FP5EW3wiY1vCndhwleRRKHowQ=")
    ).toDF("saddr", "daddr", "sport", "dport", "proto", "want")
    val got = flows.select(
      Ip.communityId(col("saddr"), col("daddr"), col("sport"), col("dport"),
        col("proto")).as("got"), col("want"))
      .as[(String, String)].collect()
    got.foreach { case (g, w) => assert(g == w) }
  }
}
