package graft

import org.apache.spark.sql.functions._

import graft.ops.{Contexts, Privacy}

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val ips = Seq(
    "10.5.1.9", "10.5.1.200", "10.5.7.9", "10.99.1.9",
    "192.168.1.1", "192.168.1.2", "0.0.0.0", "255.255.255.255")

  private def mapping(key: String): Map[String, (Long, Long)] =
    ips.toDF("ip")
      .withColumn("n", Contexts.ipToLong(col("ip")))
      .withColumn("p", Privacy.pseudonymizeIp(col("n"), key))
      .collect()
      .map(r => r.getAs[String]("ip") -> (r.getAs[Long]("n"), r.getAs[Long]("p")))
      .toMap

  /** Shared-prefix length of two 32-bit values. */
  private def spl(a: Long, b: Long): Int =
    if (a == b) 32 else java.lang.Long.numberOfLeadingZeros(a ^ b) - 32

  test("pseudonymizeIp preserves shared-prefix lengths exactly") {
    val m = mapping("k1")
    for (pair <- ips.combinations(2)) {
      val (nx, px) = m(pair.head)
      val (ny, py) = m(pair(1))
      assert(spl(nx, ny) == spl(px, py),
        s"${pair.head} vs ${pair(1)}: in-prefix ${spl(nx, ny)} out-prefix ${spl(px, py)}")
    }
  }

  test("pseudonymizeIp is deterministic, key-dependent, and in-range") {
    val m1 = mapping("k1")
    val m2 = mapping("k1")
    val m3 = mapping("other-key")
    assert(m1 == m2)
    assert(ips.exists(ip => m1(ip)._2 != m3(ip)._2), "different keys must remap")
    assert(m1.values.forall { case (_, p) => p >= 0L && p < (1L << 32) })
    // distinct inputs stay distinct (prefix preservation implies injectivity)
    assert(m1.values.map(_._2).toSet.size == ips.size)
  }

  test("numToDotted round-trips through ipToLong") {
    val out = ips.toDF("ip")
      .select(Privacy.numToDotted(Contexts.ipToLong(col("ip"))).as("rt"))
      .as[String].collect().toSeq
    assert(out.toSet == ips.toSet)
  }
}
