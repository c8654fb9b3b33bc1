package graft.similarity

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator: exact top-k (id, score) pairs per group, kept in a
  * bounded buffer — the custom-aggregate extension point (SURVEY.md §7)
  * for similarity search. Each partition keeps at most k entries
  * (partial aggregation), merges are k+k selections, so a top-k over N
  * rows moves only num_partitions*k records through the shuffle instead
  * of N — the property that matters at 100 TB.
  *
  * Ordering: score DESC, then id ASC for determinism on ties.
  */
case class ScoredId(id: Long, score: Double)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {

  private def ord: Ordering[ScoredId] =
    Ordering.by(s => (-s.score, s.id))

  override def zero: List[ScoredId] = Nil

  override def reduce(buf: List[ScoredId], a: ScoredId): List[ScoredId] =
    ((a :: buf).sorted(ord)).take(k)

  override def merge(x: List[ScoredId], y: List[ScoredId]): List[ScoredId] =
    ((x ++ y).sorted(ord)).take(k)

  override def finish(buf: List[ScoredId]): Seq[ScoredId] = buf

  // buffers are tiny (<= k entries); kryo keeps the encoder simple
  override def bufferEncoder: Encoder[List[ScoredId]] =
    Encoders.kryo[List[ScoredId]]

  override def outputEncoder: Encoder[Seq[ScoredId]] =
    Encoders.kryo[Seq[ScoredId]]
}
