package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary as a typed `Aggregator` — the
  * frequent-items sketch with the MERGEABLE-summaries guarantee
  * (Misra/Gries 1982; merge rule per Agarwal et al., "Mergeable
  * Summaries", PODS 2012): at most `k` counters at any time, and for
  * every item `est(w) ≥ count(w) − N/(k+1)` where N is the total
  * stream length — so EVERY item with true frequency above N/(k+1) is
  * guaranteed present in the summary, under any partitioning and any
  * merge order.
  *
  * This is the scale shape for "frequent tokens over a 100 TB corpus":
  * a full `groupBy(word)` shuffles |vocabulary| keys (web-scale: 10⁹+),
  * while this sketch keeps O(k) state per partition and ships ONE
  * k-entry buffer per partition to a single merge — the same
  * partial/merge contract as any built-in aggregate. The catalog's
  * t20 then makes the output exact and deterministic with a second
  * pass over only the ≤ k candidates (the classic 2-pass heavy-hitters
  * refinement).
  *
  * Buffer: (counters, total items seen). Both operations:
  *   reduce: increment, or admit the item and, if k is exceeded,
  *           subtract the (k+1)-th largest count from everyone and
  *           drop the non-positive (the batched decrement step);
  *   merge:  pointwise-add, then the same (k+1)-th-largest subtraction.
  */
class MisraGries(k: Int)
  extends Aggregator[String, (Map[String, Long], Long), (Seq[(String, Long)], Long)] {

  override def zero: (Map[String, Long], Long) = (Map.empty, 0L)

  /** Keep at most k counters: subtract the (k+1)-th largest count and
    * drop non-positive entries (a no-op when size ≤ k). */
  private def shrink(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      m.collect { case (w, c) if c > cut => w -> (c - cut) }
    }

  override def reduce(buf: (Map[String, Long], Long), w: String): (Map[String, Long], Long) =
    (shrink(buf._1.updated(w, buf._1.getOrElse(w, 0L) + 1L)), buf._2 + 1L)

  override def merge(a: (Map[String, Long], Long), b: (Map[String, Long], Long)): (Map[String, Long], Long) = {
    val sum = b._1.foldLeft(a._1) { case (m, (w, c)) =>
      m.updated(w, m.getOrElse(w, 0L) + c)
    }
    (shrink(sum), a._2 + b._2)
  }

  /** (candidates sorted by estimate desc then word, total stream length). */
  override def finish(buf: (Map[String, Long], Long)): (Seq[(String, Long)], Long) =
    (buf._1.toSeq.sortBy { case (w, c) => (-c, w) }, buf._2)

  // Native (Catalyst) encoders for buffer and output — the counter map
  // ships as a MapType column in an UnsafeRow, codegen-serialized, with
  // no kryo reflection (which on JDK 17+ needs `--add-opens
  // java.base/java.nio` when launched without spark-submit).
  override def bufferEncoder: Encoder[(Map[String, Long], Long)] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[(Seq[(String, Long)], Long)] =
    ExpressionEncoder()
}
