package graft.core

import org.apache.spark.sql.types._

/** Canonical schemas for the CDC engine.
  *
  * The page table shape comes from BASELINE.json `input_hint`; the change-event
  * envelope mirrors a WAL/binlog record (reference analogue: Tenzir's keyed
  * upsert/erase contexts, `libtenzir/builtins/contexts/lookup_table.cpp:416-470`,
  * and its typed-schema pipeline contract, `libtenzir/include/tenzir/table_slice.hpp:83-142`).
  */
object Schemas {

  /** User-facing lake table schema (Common-Crawl-style web pages). */
  val page: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = true),
    StructField("html", BinaryType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)
  ))

  /** Change-event envelope (one WAL record).
    *
    * `lsn` is the global last-writer-wins tiebreaker, strictly monotonic per
    * `wal_part` (per-source-partition ordering, like a Kafka partition offset —
    * reference analogue `plugins/kafka/builtins/plugin.cpp:85-112`).
    */
  val changeEvent: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),       // "I" | "U" | "D"
    StructField("lsn", LongType, nullable = false),
    StructField("wal_part", IntegerType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = true),
    StructField("html", BinaryType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)
  ))

  /** System columns persisted in lake data files alongside the payload.
    *
    *  - `_lsn`     : LSN of the winning writer for this row (cross-batch LWW).
    *  - `_deleted` : tombstone marker — a delete with LSN d must keep winning
    *                 against later-arriving stale updates with lsn < d, so
    *                 deletes persist as tombstones until compaction GC.
    *  - `_urlhash` : xxhash64(url); file-level min/max stats over it drive
    *                 manifest pruning (reference analogue: partition synopses,
    *                 `libtenzir/include/tenzir/partition_synopsis.hpp:30-44`).
    *  - `_wal_part`: WAL partition of the winning writer — the LWW tiebreaker
    *                 after `_lsn`, persisted so merge-on-read resolution
    *                 (multiple row versions across delta files) stays
    *                 deterministic at read time.
    */
  val systemColumns: Seq[StructField] = Seq(
    StructField("_lsn", LongType, nullable = false),
    StructField("_deleted", BooleanType, nullable = false),
    StructField("_urlhash", LongType, nullable = false),
    StructField("_wal_part", IntegerType, nullable = false)
  )

  /** Columns that are payload (not key, not system) in the change envelope. */
  val payloadColumns: Seq[String] = Seq("warc_ts", "html", "text", "lang")

  /** Key column of the table. */
  val keyColumn: String = "url"

  // ---------------------------------------------------------------------------
  // Schema evolution: additive merge + numeric widening.
  // Mirrors the reference's centralized cast/widening helper
  // (`libtenzir/include/tenzir/cast.hpp:30-140`; list recursion :243-267).
  // ---------------------------------------------------------------------------

  /** Widen two primitive types, or None if incompatible.
    * Rules: identical → same; int-family widens upward (byte<short<int<long);
    * float→double; integral+fractional → double; NullType yields the other.
    */
  def widen(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case (x, y) if x == y => Some(x)
    case (NullType, y) => Some(y)
    case (x, NullType) => Some(x)
    case (x, y) if intRank(x) >= 0 && intRank(y) >= 0 =>
      Some(if (intRank(x) >= intRank(y)) x else y)
    case (FloatType, DoubleType) | (DoubleType, FloatType) => Some(DoubleType)
    case (x, FloatType | DoubleType) if intRank(x) >= 0 => Some(DoubleType)
    case (FloatType | DoubleType, y) if intRank(y) >= 0 => Some(DoubleType)
    case (x: StructType, y: StructType) => Some(mergeStructs(x, y))
    case (ArrayType(xe, xn), ArrayType(ye, yn)) =>
      widen(xe, ye).map(e => ArrayType(e, xn || yn))
    case (MapType(xk, xv, xn), MapType(yk, yv, yn)) =>
      for { k <- widen(xk, yk); v <- widen(xv, yv) } yield MapType(k, v, xn || yn)
    case _ => None
  }

  private def intRank(t: DataType): Int = t match {
    case ByteType => 0; case ShortType => 1; case IntegerType => 2; case LongType => 3
    case _ => -1
  }

  /** Merge `incoming` into `base`: existing fields widen, new fields append as
    * nullable. Field order: base fields first (stable), then new ones. Throws
    * on incompatible type pairs (e.g. string vs long) — a CDC stream producing
    * those is a data bug that must fail loudly, not corrupt the table.
    */
  def mergeStructs(base: StructType, incoming: StructType): StructType = {
    val byName = incoming.fields.map(f => f.name -> f).toMap
    val merged = base.fields.map { bf =>
      byName.get(bf.name) match {
        case Some(inf) =>
          val t = widen(bf.dataType, inf.dataType).getOrElse(
            throw new IllegalArgumentException(
              s"incompatible schema evolution for field '${bf.name}': ${bf.dataType.sql} vs ${inf.dataType.sql}"))
          StructField(bf.name, t, bf.nullable || inf.nullable, bf.metadata)
        case None => bf
      }
    }
    val newFields = incoming.fields.filterNot(f => base.fieldNames.contains(f.name))
      .map(f => f.copy(nullable = true)) // absent in history ⇒ must be nullable
    StructType(merged ++ newFields)
  }
}
