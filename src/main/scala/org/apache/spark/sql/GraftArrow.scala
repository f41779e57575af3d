package org.apache.spark.sql

import org.apache.arrow.vector.VectorSchemaRoot
import org.apache.arrow.vector.types.pojo.{Schema => ArrowSchema}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.execution.arrow.ArrowWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnVector, ColumnarBatch}

/** Bridge into Spark's `private[sql]` Arrow interop — the same machinery
  * Spark itself uses for `toPandas`/Arrow-UDF transport (schema conversion in
  * `sql.util.ArrowUtils`, row→vector fill in `execution.arrow.ArrowWriter`) —
  * so the feather/bitz formats reuse Spark's full type coverage (nested
  * structs/arrays/maps, decimals, temporals) instead of hand-rolling a
  * per-type vector codec. Kept to thin forwarders + two tiny adapters; no
  * behavior lives here.
  */
object GraftArrow {

  /** Spark StructType → Arrow schema; `timeZoneId` applies to LTZ timestamps
    * only (NTZ maps to timezone-less Arrow timestamps).
    */
  def toArrowSchema(schema: StructType, timeZoneId: String): ArrowSchema =
    org.apache.spark.sql.util.ArrowUtils.toArrowSchema(
      schema, timeZoneId, errorOnDuplicatedFieldNames = true, largeVarTypes = false)

  def fromArrowSchema(schema: ArrowSchema): StructType =
    org.apache.spark.sql.util.ArrowUtils.fromArrowSchema(schema)

  /** External-Row writer into an Arrow VectorSchemaRoot (one record batch at
    * a time: write*, finish, [caller emits], reset).
    */
  final class RowBatchWriter(schema: StructType, root: VectorSchemaRoot) {
    private val writer = ArrowWriter.create(root)
    private val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
    def write(row: Row): Unit = writer.write(toCatalyst(row).asInstanceOf[InternalRow])
    def finish(): Unit = writer.finish()
    def reset(): Unit = writer.reset()
  }

  /** Materialize the current record batch in `root` as external Rows —
    * EAGERLY, all rows copied out before returning, so the result is valid
    * after the caller's next `loadNextBatch` replaces the vectors.
    */
  def batchRows(schema: StructType, root: VectorSchemaRoot): Seq[Row] = {
    val cols: Array[ColumnVector] =
      root.getFieldVectors.toArray(Array.empty[org.apache.arrow.vector.FieldVector])
        .map(v => new ArrowColumnVector(v): ColumnVector)
    val batch = new ColumnarBatch(cols, root.getRowCount)
    val toScala = CatalystTypeConverters.createToScalaConverter(schema)
    val out = new scala.collection.mutable.ArrayBuffer[Row](root.getRowCount)
    val it = batch.rowIterator()
    while (it.hasNext) out += toScala(it.next()).asInstanceOf[Row]
    out.toSeq
  }
}
