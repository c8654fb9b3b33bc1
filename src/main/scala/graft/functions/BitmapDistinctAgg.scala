package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact distinct-count over a bounded non-negative id domain via a
  * mergeable BITMAP — the OLAP engines' "bitmap distinct" (ClickHouse
  * groupBitmap, Doris BITMAP_UNION_COUNT) as a custom Catalyst
  * aggregate.
  *
  * The 100 TB problem: Spark's exact `countDistinct` beside other
  * aggregates plans an Expand (row multiplication) or a two-phase
  * distinct that shuffles every RAW id. For id-bounded dimensions
  * (user ids, document ids) the per-partition state can instead be a
  * bitmap of the ids seen: what crosses the wire is one bitmap per
  * partition per group — size bounded by the ID DOMAIN, independent
  * of row count — and merge is a word-wise OR. update/merge/eval are
  * all set algebra, so the result is exact and partitioning-
  * independent (hash-gateable against COUNT(DISTINCT ...)).
  *
  * This demo buffer is a dense java.util.BitSet (domain/8 bytes, the
  * right shape for the testdata's compact id spaces); a production
  * sparse-domain variant swaps in a compressed bitmap (Roaring) with
  * the IDENTICAL update/or/cardinality algebra — the operator
  * contract is the mergeable-bitmap shape, not the encoding.
  */
case class BitmapDistinctAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.BitSet]
  with UnaryLike[Expression] {

  /** Dense-bitmap guard: ids must sit in [0, MaxId]. 2^26 bits = 8 MB
    * worst-case buffer — safely above every testdata id space while
    * keeping an aggregation buffer that cannot balloon unnoticed. */
  val MaxId: Long = (1L << 26) - 1

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bitmap_distinct expects an integral id column, got $t")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.BitSet =
    new java.util.BitSet()

  override def update(buf: java.util.BitSet,
                      input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null) {
      val id = v match {
        case l: java.lang.Long    => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      require(id >= 0 && id <= MaxId,
        s"bitmap_distinct id $id outside dense domain [0, $MaxId]")
      buf.set(id.toInt)
    }
    buf
  }

  override def merge(a: java.util.BitSet,
                     b: java.util.BitSet): java.util.BitSet = {
    a.or(b)
    a
  }

  override def eval(buf: java.util.BitSet): Any =
    buf.cardinality().toLong

  override def serialize(buf: java.util.BitSet): Array[Byte] =
    buf.toByteArray

  override def deserialize(bytes: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): BitmapDistinctAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BitmapDistinctAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(
      newChild: Expression): BitmapDistinctAgg =
    copy(child = newChild)
  override def prettyName: String = "bitmap_distinct"
}

object BitmapDistinctAgg {
  /** `bitmap_distinct(idCol)`: exact distinct count of a bounded
    * non-negative id column through mergeable per-partition bitmaps. */
  def bitmapDistinct(c: Column): Column =
    GraftSqlShims.column(
      BitmapDistinctAgg(GraftSqlShims.expression(c)).toAggregateExpression())
}
