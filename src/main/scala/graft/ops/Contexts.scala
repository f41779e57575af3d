package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Context enrichment beyond exact-key lookup: Bloom-filter membership,
  * per-entry TTL expiry, and subnet longest-prefix matching — the three
  * context behaviors of the reference that round 1 left out.
  *
  * References: `/root/reference/libtenzir/builtins/contexts/bloom_filter.cpp`
  * (membership context), `contexts/lookup_table.cpp:218-243` (create/update
  * timeouts), `:298-341` (subnet-keyed longest-prefix probe).
  */
object Contexts {

  // ------------------------------------------------------------------ bloom

  /** A built Bloom filter: `m` bits packed 32 per long word (32, not 64 —
    * `1 << 63` is an overflow ERROR in DuckDB, and the oracle must build the
    * identical filter), 2 probes per key (md5h60 halves). Both the build and
    * the probe are md5h60-arithmetic, so a DuckDB oracle reproduces even the
    * false positives.
    */
  case class BloomFilter(mBits: Int, words: Array[Long]) {
    /** Membership test as a pure Column (the words array is a literal —
      * broadcast with the plan, no shuffle, no UDF).
      */
    def mightContain(key: Column): Column = {
      val lits = typedlit(words.toSeq)
      // column-valued shift amounts need the SQL function form
      // (functions.shiftright only takes a literal Int shift)
      def bitSet(p: Column): Column =
        (call_function("shiftright", element_at(lits, (p / 32).cast("int") + 1),
          pmod(p, lit(32)).cast("int")).bitwiseAND(lit(1L))) === 1L
      val h = Text.md5h60(key)
      val p1 = pmod(shiftrightunsigned(h, 30), lit(mBits.toLong))
      val p2 = pmod(h.bitwiseAND(lit((1L << 30) - 1)), lit(mBits.toLong))
      bitSet(p1) && bitSet(p2)
    }
  }

  /** Build a Bloom filter over a key column: two md5h60-derived positions per
    * key, OR-folded into words with a map-side-combining `bit_or` aggregate;
    * only `m/32` longs come back to the driver.
    */
  def bloomBuild(keys: DataFrame, keyCol: Column, mBits: Int): BloomFilter = {
    require(mBits % 32 == 0, "mBits must be a multiple of 32")
    val h = Text.md5h60(keyCol)
    val pos = keys.select(explode(array(
      pmod(shiftrightunsigned(h, 30), lit(mBits.toLong)),
      pmod(h.bitwiseAND(lit((1L << 30) - 1)), lit(mBits.toLong)))).as("p"))
    val rows = pos
      .select((col("p") / 32).cast("int").as("w"),
        call_function("shiftleft", lit(1L), pmod(col("p"), lit(32)).cast("int")).as("bit"))
      .groupBy(col("w")).agg(expr("bit_or(bit)").as("bits"))
      .collect()
    val words = new Array[Long](mBits / 32)
    rows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    BloomFilter(mBits, words)
  }

  // ------------------------------------------------------------- TTL lookup

  /** Enrich with a keyed lookup context whose entries expire per the
    * reference's `create-timeout`/`update-timeout` semantics: relative to the
    * probing event's own time, an entry is live while
    * `eventTime < created_ts + createTimeout` and
    * `eventTime < updated_ts + updateTimeout`. The context is broadcast; the
    * event stream is never shuffled. Expired entries enrich as null (the
    * reference's miss behavior), they are not dropped.
    *
    * @param ctx  lookup side: key columns ++ value columns ++
    *             `created_ts`/`updated_ts` timestamp columns
    */
  def enrichWithTtl(
      events: DataFrame,
      ctx: DataFrame,
      key: Seq[String],
      eventTime: Column,
      createTimeoutSec: Option[Long] = None,
      updateTimeoutSec: Option[Long] = None): DataFrame = {
    val valueCols = ctx.columns.filterNot(c => key.contains(c) ||
      c == "created_ts" || c == "updated_ts")
    val joined = events.join(broadcast(ctx), key, "left")
    val live = Seq(
      createTimeoutSec.map(t => eventTime < col("created_ts") + expr(s"INTERVAL $t SECONDS")),
      updateTimeoutSec.map(t => eventTime < col("updated_ts") + expr(s"INTERVAL $t SECONDS"))
    ).flatten.reduceOption(_ && _).getOrElse(lit(true))
    val guarded = valueCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, when(col("created_ts").isNotNull && live, col(c)))
    }
    guarded.drop("created_ts", "updated_ts")
  }

  // ------------------------------------------------------ subnet enrichment

  /** Dotted-quad IPv4 string → numeric (long) — pure column arithmetic. */
  def ipToLong(ip: Column): Column = {
    def oct(i: Int) = split_part(ip, lit("."), lit(i)).cast("long")
    oct(1) * 16777216L + oct(2) * 65536L + oct(3) * 256L + oct(4)
  }

  /** Network mask for a prefix length column (0..32). */
  private def maskOf(len: Column): Column =
    when(len === 0, 0L)
      .otherwise(bitwise_not(call_function("shiftleft", lit(1L), (lit(32) - len).cast("int")) - 1L)
        .bitwiseAND(lit(0xFFFFFFFFL)))

  /** Range-keyed enrichment — the `geoip` context shape (reference
    * `libtenzir/builtins/contexts/geoip.cpp`: an mmdb is a sorted array of
    * disjoint IP ranges with attached attributes). `ctx` holds
    * `range_lo`/`range_hi` (inclusive) numeric bounds plus value columns;
    * each event's `keyNum` probes via a broadcast range join — the context is
    * small by contract, the event stream is never shuffled. Ranges are
    * assumed disjoint (mmdb invariant); overlaps would duplicate events.
    */
  def enrichRange(events: DataFrame, keyNum: Column, ctx: DataFrame): DataFrame =
    events.join(broadcast(ctx),
      keyNum >= col("range_lo") && keyNum <= col("range_hi"), "left")
      .drop("range_lo", "range_hi")

  /** Longest-prefix subnet enrichment: `ctx` holds `cidr` strings plus value
    * columns; each event's `ipCol` is matched against every subnet via a
    * broadcast join on the masked address, and the longest matching prefix
    * wins (reference `lookup_table.cpp:298-341`). Contexts are small by
    * contract (they broadcast); the per-event match set is reduced with one
    * `max_by` aggregate keyed by the event's own key column.
    */
  def enrichLongestPrefix(
      events: DataFrame,
      eventKey: String,
      ipCol: Column,
      ctx: DataFrame): DataFrame = {
    val subnets = ctx
      .withColumn("__len", split_part(col("cidr"), lit("/"), lit(2)).cast("int"))
      .withColumn("__mask", maskOf(col("__len")))
      .withColumn("__base",
        ipToLong(split_part(col("cidr"), lit("/"), lit(1))).bitwiseAND(col("__mask")))
    val valueCols = ctx.columns.filterNot(_ == "cidr")
    val probe = events.withColumn("__ip", ipToLong(ipCol))
    val matched = probe.join(broadcast(subnets),
      probe("__ip").bitwiseAND(subnets("__mask")) === subnets("__base"), "inner")
    val evCols = events.columns
    val best = matched
      .groupBy(col(eventKey))
      .agg(max_by(
        struct((valueCols.map(col) :+ col("__len").as("prefix_len")).toIndexedSeq: _*),
        col("__len")).as("__best"))
      .select(col(eventKey), col("__best.*"))
    events.join(best, Seq(eventKey), "left")
  }
}
