package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit

/** The ingest-time clock behind `@import_time` stamping (the reference
  * attaches an import timestamp to every slice as it enters the node —
  * `libtenzir/include/tenzir/table_slice.hpp:137-142`). Readers stamp the
  * frame once per read with the CURRENT wall time; specs inject a fixed
  * clock for determinism. A user-supplied `@import_time` column is never
  * clobbered (explicit metadata writes win, as in the reference).
  */
object IngestClock {

  /** Metadata column name (TQL `@import_time`). */
  val Column = "@import_time"

  @volatile var now: () => java.time.Instant = () => java.time.Instant.now()

  /** Attach `@import_time` (a timestamp literal — one stamp per read, the
    * reference's per-slice import time granularity) unless already present.
    */
  def stamp(df: DataFrame): DataFrame =
    if (df.columns.contains(Column)) df
    else df.withColumn(Column, lit(new java.sql.Timestamp(now().toEpochMilli)))
}
