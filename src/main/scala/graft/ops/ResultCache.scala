package graft.ops

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame

/** The `cache` operator (reference
  * `/root/reference/libtenzir/builtins/operators/cache.cpp`: a node-side
  * named in-memory result cache with TTLs — writers fill it once, readers hit
  * it by id until it expires).
  *
  * Spark mapping: `DataFrame.persist()` IS the cluster-wide materialized
  * result (executor block-manager memory, spill-safe, partition-parallel
  * reads) — the cache here only adds the reference's naming + TTL contract on
  * top. `readTtlMs`/`writeTtlMs` mirror the reference's read/write timeouts
  * (cache.cpp: `read_timeout`, `write_timeout`): the write TTL is an absolute
  * lifetime from creation, the read TTL slides on every hit.
  *
  * `now` is injectable for deterministic tests; defaults to wall clock.
  */
class ResultCache(now: () => Long = () => System.currentTimeMillis()) {

  private case class Entry(df: DataFrame, createdAt: Long, var lastRead: Long,
      readTtlMs: Long, writeTtlMs: Long) {
    def expired(t: Long): Boolean =
      (writeTtlMs > 0 && t - createdAt >= writeTtlMs) ||
      (readTtlMs > 0 && t - lastRead >= readTtlMs)
  }

  private val entries = TrieMap.empty[String, Entry]

  /** Cache `df` under `id` (persists it). Overwrites an existing id. */
  def put(id: String, df: DataFrame, readTtlMs: Long = 0, writeTtlMs: Long = 0): DataFrame = {
    entries.remove(id).foreach(_.df.unpersist())
    val t = now()
    entries.put(id, Entry(df.persist(), t, t, readTtlMs, writeTtlMs))
    df
  }

  /** Look up `id`; a hit slides its read TTL. Expired entries are unpersisted
    * and reported as misses.
    */
  def get(id: String): Option[DataFrame] = {
    evictExpired()
    entries.get(id).map { e => e.lastRead = now(); e.df }
  }

  /** `cache` op semantics: return the cached result for `id` if present,
    * otherwise compute via `mk`, cache, and return it.
    */
  def getOrPut(id: String, readTtlMs: Long = 0, writeTtlMs: Long = 0)
      (mk: => DataFrame): DataFrame =
    get(id).getOrElse(put(id, mk, readTtlMs, writeTtlMs))

  /** Unpersist and drop every expired entry; returns how many were evicted. */
  def evictExpired(): Int = {
    val t = now()
    val dead = entries.filter(_._2.expired(t)).keys.toSeq
    dead.foreach(id => entries.remove(id).foreach(_.df.unpersist()))
    dead.size
  }

  def remove(id: String): Unit = entries.remove(id).foreach(_.df.unpersist())
  def ids: Set[String] = entries.keySet.toSet
}
