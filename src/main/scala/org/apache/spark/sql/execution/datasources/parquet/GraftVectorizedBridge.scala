package org.apache.spark.sql.execution.datasources.parquet

import org.apache.parquet.column.page.PageReadStore
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.schema.MessageType

/** Bridge to [[VectorizedParquetRecordReader]]'s row-group-reader
  * initialize overload: the method itself is public, but its
  * `ParquetRowGroupReader` parameter interface is package-private to
  * this package, so an implementation must live here. The freqstore
  * DSv2 columnar scan ([[graft.sources.FreqStoreColumnarPartitionReader]])
  * uses it to keep FULL control of file opening — session Hadoop conf,
  * pushed-range row-group statistics filtering, projected columns —
  * while delegating all page decoding to Spark's own vectorized reader.
  * Package placement is the same technique Spark connector libraries
  * use for package-private access; no Spark internals are modified. */
object GraftVectorizedBridge {
  /** Wire a caller-supplied row-group SOURCE into the vectorized
    * reader — the caller chains all of a component's files through one
    * vectorized reader (one initialize per component, not per file)
    * and owns the file readers' lifecycle. `next` returns null when
    * exhausted; `totalRowCount` must equal the source's total
    * surviving rows. */
  def initializeChained(v: VectorizedParquetRecordReader,
      fileSchema: MessageType, requestedSchema: MessageType,
      totalRowCount: Int, next: () => PageReadStore): Unit =
    v.initialize(fileSchema, requestedSchema,
      new SpecificParquetRecordReaderBase.ParquetRowGroupReader {
        override def readNextRowGroup(): PageReadStore = next()
        override def close(): Unit = () // caller owns the file readers
      }, totalRowCount)
}
