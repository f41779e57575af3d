package graft.ops

import java.time.Instant
import java.util.concurrent.ConcurrentLinkedDeque

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's `diagnostics` introspection source
  * (`/root/reference/libtenzir/builtins/operators/diagnostics.cpp` — operator
  * warnings/errors surfaced as ordinary events): a bounded driver-side
  * diagnostics bus that pipeline components report into, queryable as a
  * DataFrame with the same operator surface as data.
  *
  * Driver-side by design: diagnostics are emitted where control-flow
  * decisions happen (drop callbacks, cap filters, assertion sinks — all
  * `foreachBatch`/driver code), never inside row-level expressions, so the
  * bus adds zero cost to the data path. Bounded FIFO: old entries age out at
  * `MaxEntries` like the reference's diagnostics buffer.
  */
object Diagnostics {

  final case class Entry(ts: String, severity: String, source: String, message: String)

  val MaxEntries = 10000

  private val buf = new ConcurrentLinkedDeque[Entry]()
  // ConcurrentLinkedDeque.size() is O(n): keep an O(1) element counter so a
  // full bus doesn't pay a 10k-node walk per report
  private val n = new java.util.concurrent.atomic.AtomicInteger(0)

  def report(severity: String, source: String, message: String): Unit = {
    buf.addLast(Entry(Instant.now().toString, severity, source, message))
    if (n.incrementAndGet() > MaxEntries && buf.pollFirst() != null) n.decrementAndGet()
  }

  def warning(source: String, message: String): Unit = report("warning", source, message)
  def error(source: String, message: String): Unit = report("error", source, message)

  /** The buffered diagnostics as a DataFrame (`diagnostics | where …`). */
  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    spark.createDataset(buf.iterator().asScala.toSeq).toDF()
  }

  def clear(): Unit = { buf.clear(); n.set(0) }
}
