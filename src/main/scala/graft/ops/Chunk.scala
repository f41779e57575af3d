package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Training-data chunking: split documents into fixed-token context windows.
  *
  * Two halves of the standard LLM data-prep step the reference stops short
  * of (its pipeline ends at parsed/deduped events):
  *
  *  - [[chunkTokens]]: per-document overlapping token windows (RAG-style
  *    chunking). Pure per-row work — tokens, window starts, and slices are
  *    all Catalyst HOFs over one scan: no shuffle at any scale, chunk count
  *    scales the output not the plan.
  *  - [[packContext]]: concat-then-split packing (GPT-style pretraining
  *    batches): every document gets its global token offset in a total
  *    order, and from it the context-window ids its tokens span. The global
  *    running sum is computed like [[Pipe.enumerate_]] — range-partition on
  *    the order key, one tiny per-partition-totals job, per-partition window
  *    cumsum plus the exclusive prefix — NOT a bare `Window.orderBy`, which
  *    would funnel 100 TB through one task.
  *
  * Both are deterministic (whitespace tokens, integer arithmetic) so a
  * DuckDB oracle recomputes them exactly.
  */
object Chunk {

  /** One row per (document, chunk): `chunk_idx`, `chunk_text`,
    * `chunk_tokens`. Windows are `chunkSize` whitespace tokens advancing by
    * `chunkSize - overlap`; the last window may be short; empty/null texts
    * yield no chunks.
    */
  def chunkTokens(df: DataFrame, textCol: String, idCol: String,
      chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(overlap >= 0 && overlap < chunkSize, "overlap must be in [0, chunkSize)")
    val stride = chunkSize - overlap
    val n = coalesce(size(Text.tokens(col(textCol))).cast("long"), lit(0L))
    // chunk count: 1 + ceil((n - chunkSize) / stride) for n > 0, clamped at 1
    val nChunks = when(n > 0,
      lit(1L) + floor((greatest(n - chunkSize, lit(0L)) + (stride - 1)) / stride).cast("long"))
    df.select(col(idCol), Text.tokens(col(textCol)).as("__toks"), nChunks.as("__nc"))
      // null __nc (empty doc) explodes to zero rows — empty docs drop
      .withColumn("__i", explode(when(col("__nc") > 0, sequence(lit(0L), col("__nc") - 1))))
      .withColumn("__ct",
        slice(col("__toks"), (col("__i") * stride + 1).cast("int"), lit(chunkSize)))
      .select(col(idCol), col("__i").as("chunk_idx"),
        array_join(col("__ct"), " ").as("chunk_text"),
        size(col("__ct")).cast("long").as("chunk_tokens"))
  }

  /** Per-document global token offsets and spanned context-window ids under
    * concat-then-split packing: documents are laid end to end in `idCol`
    * order and cut every `contextSize` tokens. Emits `n_tokens`,
    * `tok_offset` (exclusive global prefix), `bin_first`/`bin_last` (the
    * window ids this document's tokens land in; zero-token docs get
    * `bin_first = bin_last` at their offset).
    */
  def packContext(df: DataFrame, textCol: String, idCol: String,
      contextSize: Int): DataFrame = {
    require(contextSize > 0, "contextSize must be positive")
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    // Same determinism contract as Pipe.enumerate_: persist pins ONE range
    // sampling so the totals job and the final job agree on partitioning.
    val withPid = df
      .select(col(idCol), coalesce(Text.tokenCount(col(textCol)), lit(0L)).as("n_tokens"))
      .repartitionByRange(parts, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = withPid.groupBy(col("__pid")).agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      totals.map { case (p, t) => val o = acc; acc += t; (p, o) }.toMap
    }
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tokOffset = sum(col("n_tokens")).over(w) - col("n_tokens") +
      Pipe.offsetColumn(offsets)
    val c = lit(contextSize.toLong)
    withPid
      .withColumn("tok_offset", tokOffset)
      .withColumn("bin_first", floor(col("tok_offset") / c).cast("long"))
      .withColumn("bin_last",
        floor((col("tok_offset") + greatest(col("n_tokens") - 1, lit(0L))) / c).cast("long"))
      .drop("__pid")
  }
}
