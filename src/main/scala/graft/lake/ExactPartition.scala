package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-placement repartitioning for low-cardinality keys.
  *
  * `DataFrame.repartition(n, expr)` always routes rows by
  * `pmod(murmur3(expr), n)` — with few distinct key values (e.g. 64 bucket
  * ids into 32 shuffle partitions) that is a balls-in-bins draw: some
  * partitions get 3-4 keys, ~1/e get none, and the widest task straggles the
  * whole write stage (measured 2x task-skew in the CDC write stage at 16
  * cores). Spark's public Dataset API has no "place key k in partition p"
  * hook, but the hash is deterministic — so for each target partition `s` we
  * precompute (driver-side, microseconds) an integer preimage `k_s` with
  * `pmod(murmur3(k_s), n) == s`, map each key to the preimage of its desired
  * slot, and let the ordinary hash shuffle do exact round-robin placement.
  *
  * This keeps the whole plan in DataFrame/Catalyst land (codegen, AQE intact)
  * — no RDD partitioner, no custom physical plan.
  */
object ExactPartition {

  /** Murmur3 int hash exactly as Spark's HashPartitioning computes it for an
    * IntegerType expression (seed 42), pmod'ed into `n` partitions.
    */
  private def sparkPartition(key: Int, n: Int): Int = {
    val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(key, 42)
    val m = h % n
    if (m < 0) m + n else m
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Int]]()

  /** `keysFor(n)(s)` = an int whose Spark hash-partition over `n` is `s`. */
  def keysFor(n: Int): Array[Int] = cache.computeIfAbsent(n, { nn =>
    val keys = new Array[Int](nn)
    val found = new Array[Boolean](nn)
    var remaining = nn
    var x = 0
    while (remaining > 0) {
      val s = sparkPartition(x, nn)
      if (!found(s)) { found(s) = true; keys(s) = x; remaining -= 1 }
      x += 1
    }
    keys
  })

  /** Repartition `df` into exactly `n` partitions with rows routed by
    * `slotOf` (any Int-typed column expression in `[0, n)`), one slot per
    * partition, perfectly deterministic. The helper column is dropped again.
    */
  def bySlot(df: DataFrame, n: Int, slotOf: Column): DataFrame = {
    if (n <= 1) return df.repartition(1)
    val keys = keysFor(n)
    val routed = df
      .withColumn("_xp_slot", element_at(typedlit(keys.toSeq), slotOf.cast("int") + 1))
      .repartition(n, col("_xp_slot"))
    routed.drop("_xp_slot")
  }
}
