package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (the §2.10 `Aggregator[IN, BUF, OUT]` slot):
  * exact top-k of (key, value) pairs per group WITHOUT a per-group sort
  * — each partial buffer holds at most k entries, so the shuffle
  * carries O(groups × k), not O(rows). The scale path for "top N per
  * group" when the group count is huge and a ranking window (which
  * sorts every group's full row set) would dominate the stage.
  *
  * Total order (value desc, key asc) makes results deterministic under
  * any partitioning — same tie rule as the window-function oracle form.
  */
class TopKByValue(k: Int)
  extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  private def ord: Ordering[(Long, Double)] =
    Ordering.by[(Long, Double), (Double, Long)] { case (key, v) => (-v, key) }

  override def zero: Seq[(Long, Double)] = Vector.empty

  override def reduce(buf: Seq[(Long, Double)], in: (Long, Double)): Seq[(Long, Double)] =
    (buf :+ in).sorted(ord).take(k)

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf

  // Native (Catalyst) encoders for BOTH buffer and output: the partial
  // buffer crosses the shuffle as an UnsafeRow-backed binary column, so
  // serialization is codegen'd and needs no runtime reflection. (The
  // kryo alternative additionally requires `--add-opens
  // java.base/java.nio` on JDK 17+ when the JVM is launched without
  // spark-submit — a deployment fragility a library shouldn't carry.)
  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder()
}
