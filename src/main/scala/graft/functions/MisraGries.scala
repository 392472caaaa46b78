package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries heavy-hitters summary as a typed
  * [[Aggregator]] — the classic bounded-memory frequent-items sketch
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS'12). The buffer holds at most `k` counters;
  * reduce decrements all counters when a new item arrives at a full
  * buffer, merge sums counterparts and then subtracts the (k+1)-th
  * largest count so at most k survive.
  *
  * Guarantees (hold under ANY partitioning / merge order — this is
  * what the q102 oracle gates on, since the raw counter values
  * themselves depend on merge order):
  *   - every item with true frequency > n/k is in the summary
  *     (candidate superset);
  *   - for surviving items, trueCount - estimate <= n/k.
  *
  * Scale: the buffer is O(k) per partition regardless of input size,
  * combines map-side, and the final merge touches k counters per
  * partition — the shape that finds hot keys in a 100-TB stream
  * without a full groupBy.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  // k <= 0 would silently yield an always-empty sketch (the size guard
  // in reduce never admits an item), voiding the frequency guarantee
  // with no error — fail at construction like TopKPerGroupNode does
  require(k > 0, "MisraGries capacity k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1L)
      case None if b.size < k => b.updated(x, 1L)
      case None =>
        // decrement-all: drop zeros, new item absorbed into the
        // decrement (standard MG step)
        b.iterator.map { case (kk, c) => kk -> (c - 1L) }
          .filter(_._2 > 0L).toMap
    }

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val sum = (b1.keySet ++ b2.keySet).iterator
      .map(kk => kk -> (b1.getOrElse(kk, 0L) + b2.getOrElse(kk, 0L))).toMap
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from everything; at most
      // k strictly-positive counters remain (Mergeable Summaries §3)
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
      sum.iterator.map { case (kk, c) => kk -> (c - cut) }
        .filter(_._2 > 0L).toMap
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
