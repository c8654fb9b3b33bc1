package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Production 64-bit SimHash as ONE custom aggregate.
  *
  * The pure-expression formulation (64 × `sum(when(nibble-bit, 1))` +
  * `count(*)`, see the q_dedup_simhash64 oracle SQL) is semantically
  * identical but plans a 65-buffer HashAggregate whose generated code
  * takes ~1s to janino-compile and evaluates 64 unrolled
  * modulo/compare expressions per row. This TypedImperativeAggregate
  * keeps one long[65] buffer (64 bit-vote counters + row count) and
  * updates it in a single tight loop over the md5 hex bytes — same
  * result, one aggregate expression, partial-aggregation friendly
  * (merge = elementwise add), so map-side combine still happens before
  * the shuffle.
  *
  * Input: the 32-char lowercase md5 hex of a token. Bit k (LSB-first
  * within nibble) of the fingerprint is set iff at least half the
  * input rows have bit (k%4) of hex digit (k/4) set — exactly the
  * voting rule of the expression formulation, so swapping this into
  * the oracle-verified query is hash-safe. Output: struct(hi, lo),
  * each a non-negative 32-bit half in a BIGINT (cross-engine safe).
  */
case class SimHash64Agg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects a string (md5 hex) column, got $t")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false)))
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](65)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var j = 0
      while (j < 16) {
        val c = bytes(j)
        val nib = if (c <= '9') c - '0' else c - 'a' + 10
        var b = 0
        while (b < 4) {
          if (((nib >> b) & 1) == 1) buf(4 * j + b) += 1
          b += 1
        }
        j += 1
      }
      buf(64) += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 65) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val n = buf(64)
    var lo = 0L
    var hi = 0L
    var k = 0
    while (k < 32) { if (2 * buf(k) >= n) lo |= 1L << k; k += 1 }
    while (k < 64) { if (2 * buf(k) >= n) hi |= 1L << (k - 32); k += 1 }
    InternalRow(hi, lo)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(65 * 8)
    var i = 0
    while (i < 65) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](65)
    var i = 0
    while (i < 65) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): SimHash64Agg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHash64Agg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): SimHash64Agg =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHash64Agg {
  /** `simhash64(md5Hex)` aggregate column: struct(hi, lo). */
  def simhash64(c: Column): Column =
    GraftSqlShims.column(
      SimHash64Agg(GraftSqlShims.expression(c)).toAggregateExpression())
}
