package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed [[Aggregator]] (the UDAF extension point):
  * each partition keeps only its k best (score, id) pairs, so the shuffle
  * carries k rows per group per partition instead of the whole group — the
  * map-side-combine shape that makes per-group top-k viable when a group
  * spans millions of rows. Ordering is (score desc, id asc): ties are
  * broken by id, so the result is a total order and deterministic across
  * partitionings.
  *
  * Complements the planner's global TakeOrderedAndProject (q10) — that
  * operator is top-k over the whole dataset; this one is top-k *per group*
  * without materializing any group.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)],
      row: (Double, Long)): Seq[(Double, Long)] =
    // fast path: a full buffer whose worst entry beats the row — the
    // overwhelmingly common case on large groups — costs one comparison,
    // no allocation, no sort
    if (buf.length >= k && ord.lteq(buf.last, row)) buf
    // k is small: insert-sort-trim beats heap bookkeeping at this size
    else (buf :+ row).sorted(ord).take(k)

  override def merge(a: Seq[(Double, Long)],
      b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    bufferEncoder
}
