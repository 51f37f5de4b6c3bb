package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries heavy-hitter summary over Long keys — the
  * bounded-state candidate pass of exact two-phase heavy-hitter mining.
  *
  * Each partition keeps at most `capacity` counters; the shuffle carries
  * one `capacity`-sized map per partition instead of one row per key. The
  * classic guarantee (Misra & Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS'12): any key whose true frequency exceeds
  * n/(capacity+1) survives in the final summary. Run an exact recount
  * over the surviving candidates to turn the superset into an exact
  * answer — that second pass scans the data once more but aggregates only
  * |candidates| keys, so its reduce side is O(capacity), not O(distinct).
  *
  * At 100 TB this replaces a full groupBy over a possibly-unbounded key
  * domain (sessions, URLs, n-grams) with two bounded-memory passes.
  */
class MisraGriesAgg(capacity: Int)
    extends Aggregator[Long, Map[Long, Long], Seq[Long]] with Serializable {
  require(capacity > 0, "capacity must be positive")

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(m: Map[Long, Long], key: Long): Map[Long, Long] =
    m.get(key) match {
      case Some(c) => m.updated(key, c + 1)
      case None if m.size < capacity => m.updated(key, 1L)
      case None =>
        // full and key absent: decrement every counter, drop the zeros
        // (amortized O(1) decrements per arriving row)
        m.collect { case (k, c) if c > 1 => k -> (c - 1) }
    }

  override def merge(a: Map[Long, Long],
      b: Map[Long, Long]): Map[Long, Long] = {
    val summed = b.foldLeft(a) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }
    if (summed.size <= capacity) summed
    else {
      // subtract the (capacity+1)-th largest count from everyone; at most
      // `capacity` counters stay strictly positive. This is the decrement
      // step batched: the error budget telescopes across merges.
      val cut = summed.valuesIterator.toArray.sorted(
        Ordering[Long].reverse).apply(capacity)
      summed.collect { case (k, c) if c > cut => k -> (c - cut) }
    }
  }

  override def finish(m: Map[Long, Long]): Seq[Long] = m.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
