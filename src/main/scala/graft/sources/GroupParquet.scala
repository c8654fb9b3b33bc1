package graft.sources

import org.apache.parquet.example.data.Group
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side decoding of parquet Groups (parquet-hadoop's example
  * API — no Spark-internal reader classes) into Spark rows/values,
  * shared by the change-feed reader ([[FeedParquetReaderFactory]])
  * and the catalog table scan ([[GraftChainScan]]). Fields resolve BY
  * NAME against the file schema, primitives convert directly, INT96
  * timestamps decode to micros. Complex/decimal columns are rejected
  * with a clear error — the chain's tables are flat by construction. */
private[sources] object GroupParquet {

  /** One field of `g` as a Spark-internal value for `dataType`
    * (UTF8String for strings), or null when absent/unset. */
  def fieldValue(g: Group, name: String, dataType: DataType): Any = {
    val gt = g.getType
    if (!gt.containsField(name)) return null
    val i = gt.getFieldIndex(name)
    if (g.getFieldRepetitionCount(i) == 0) return null
    dataType match {
      case StringType => UTF8String.fromString(g.getString(i, 0))
      case LongType => g.getLong(i, 0)
      case IntegerType => g.getInteger(i, 0)
      case DoubleType => g.getDouble(i, 0)
      case FloatType => g.getFloat(i, 0)
      case BooleanType => g.getBoolean(i, 0)
      case BinaryType => g.getBinary(i, 0).getBytes
      case DateType => g.getInteger(i, 0)
      case TimestampType =>
        gt.getType(i).asPrimitiveType().getPrimitiveTypeName match {
          case org.apache.parquet.schema.PrimitiveType
              .PrimitiveTypeName.INT64 => g.getLong(i, 0)
          case org.apache.parquet.schema.PrimitiveType
              .PrimitiveTypeName.INT96 =>
            // 8 LE bytes nanos-of-day + 4 LE bytes julian day
            val b = g.getInt96(i, 0).getBytes
            val buf = java.nio.ByteBuffer.wrap(b)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val nanos = buf.getLong
            val julian = buf.getInt
            (julian - 2440588L) * 86400000000L + nanos / 1000L
          case t => throw new UnsupportedOperationException(
            s"timestamp physical type $t")
        }
      case t => throw new UnsupportedOperationException(
        s"cannot decode column '$name' of type ${t.simpleString} — " +
          "the chain's tables are flat primitive columns")
    }
  }

  /** The whole group as an InternalRow shaped by `schema`. */
  def decode(g: Group, schema: StructType): InternalRow =
    InternalRow.fromSeq(schema.fields.toIndexedSeq.map(f =>
      fieldValue(g, f.name, f.dataType)))

  /** A field decoded to a JVM-comparable value (String, not
    * UTF8String) — the equality-delete matcher's currency. */
  def plainValue(g: Group, name: String, dataType: DataType): Any =
    fieldValue(g, name, dataType) match {
      case u: UTF8String => u.toString
      case b: Array[Byte] => b.toSeq
      case v => v
    }

  /** Open a Group reader over one parquet file. */
  def open(path: String, conf: org.apache.hadoop.conf.Configuration)
      : org.apache.parquet.hadoop.ParquetReader[Group] = {
    @annotation.nowarn("cat=deprecation")
    val r = org.apache.parquet.hadoop.ParquetReader
      .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
        new org.apache.hadoop.fs.Path(path))
      .withConf(conf)
      .build()
    r
  }

  /** Fold every row of `paths` through `f` (driver- or executor-side
    * sidecar loading: DV positions, equality-delete keys). */
  def foreachRow(paths: Seq[String],
                 conf: org.apache.hadoop.conf.Configuration)
                (f: Group => Unit): Unit =
    paths.foreach { p =>
      val r = open(p, conf)
      try {
        var g = r.read()
        while (g != null) { f(g); g = r.read() }
      } finally r.close()
    }
}
