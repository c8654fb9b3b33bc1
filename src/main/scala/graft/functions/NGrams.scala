package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst GENERATOR emitting one row per word n-gram of a
  * string-array column — the third custom-extension category in the
  * engine (scalar/aggregate expressions and whole operators being the
  * first two).
  *
  * Why a Generator and not the window-lead construction the dedup
  * family uses (posexplode -> lead(tok, k) over a per-doc window):
  * the window form SHUFFLES the whole exploded token table by doc_id
  * before a single gram exists — at 100 TB that is the largest
  * exchange in the job, moving ~n_tokens rows purely to reassemble
  * adjacency the source row already had. ngrams() emits grams
  * MAP-SIDE inside GenerateExec: zero shuffle, no per-doc state, and
  * the downstream aggregate sees the same uniform gram keys. (It also
  * beats the HOF transform-over-range form, which re-evaluates the
  * lambda per element against a re-materialized array.)
  *
  * Identical null/edge semantics to the window construction so it can
  * swap into oracle-gated queries: a null or shorter-than-n array
  * emits nothing; null elements inside the array are impossible from
  * split() but would be skipped by concatWs like empty strings.
  */
case class NGramsGen(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure(s"ngrams n must be >= 1, got $n")
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngrams expects array<string>, got $t")
  }

  override def elementSchema: StructType =
    new StructType().add("gram", StringType, nullable = false)

  private val sep = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) return Nil
    val arr = data.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return Nil
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i); i += 1 }
    (0 to len - n).iterator.map { s =>
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks(s + j); j += 1 }
      InternalRow(UTF8String.concatWs(sep, parts: _*))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): NGramsGen =
    copy(child = newChild)
}

object NGramsGen {
  /** DataFrame-side helper: one output row per n-gram, column `gram`. */
  def ngrams(tokens: Column, n: Int): Column =
    GraftSqlShims.column(NGramsGen(GraftSqlShims.expression(tokens), n))
}
