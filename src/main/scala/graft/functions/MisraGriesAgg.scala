package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a mergeable custom aggregate.
  *
  * The 100 TB problem: finding frequent tokens with a plain
  * `groupBy(token).count()` shuffles the ENTIRE token stream — at
  * trillions of rows the exchange dwarfs every other stage, yet the
  * answer only needs the handful of keys above a frequency threshold.
  * Misra-Gries summarizes a partition's stream in k bounded counters:
  * all that crosses the wire is one k-entry sketch per partition,
  * independent of stream length.
  *
  * Guarantee (Misra & Gries 1982; merged summaries keep it per
  * Agarwal et al., "Mergeable Summaries", PODS'12): every item with
  * true frequency > N/(k+1) survives in the merged sketch, and each
  * kept counter underestimates a true count by at most N/(k+1). The
  * sketch CONTENT depends on stream order (so it is never hash-gated
  * directly); the deterministic production pattern is sketch → tiny
  * candidate set → exact recount restricted to candidates (see
  * q_heavy_hitters), whose final output is order- and
  * partitioning-independent precisely because of the superset
  * guarantee.
  *
  * update: classic MG — increment a held counter, insert if a slot is
  * free, else decrement ALL counters (amortized O(1): each decrement
  * pays for k+1 stream items). merge: add counts, then if more than k
  * keys survive, subtract the (k+1)-th largest count from every
  * counter and drop the non-positive ones (the "offset" form of MG
  * merge, which keeps the additive error bound).
  *
  * Output: array<struct<token, est>> sorted by (est desc, token) —
  * the sort makes single-partition evaluation deterministic for specs,
  * though cross-partition content remains order-sensitive by nature.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"misra_gries needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"misra_gries expects a string column, got $t")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val tok = v.asInstanceOf[UTF8String].toString
      buf.get(tok) match {
        case Some(c) => buf.update(tok, c + 1)
        case None if buf.size < k => buf.update(tok, 1L)
        case None => // decrement-all; drop zeros
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace { (t, c) => if (c == 1) { dead += t; 0 } else c - 1 }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everything; at most k
      // strictly-greater counters can then survive
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace { (t, c) =>
        val nc = c - cut
        if (nc <= 0) dead += t
        nc
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray
      .sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) => InternalRow(UTF8String.fromString(t), c) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray.map { case (t, c) =>
      (t.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(
      4 + entries.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(entries.length)
    entries.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val tb = new Array[Byte](len)
      bb.get(tb)
      buf.update(new String(tb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
  override def prettyName: String = "misra_gries"
}

object MisraGriesAgg {
  /** `misra_gries(col, k)` aggregate: array<struct<token, est>> of at
    * most k candidate heavy hitters. */
  def misraGries(c: Column, k: Int): Column =
    GraftSqlShims.column(
      MisraGriesAgg(GraftSqlShims.expression(c), k).toAggregateExpression())
}
