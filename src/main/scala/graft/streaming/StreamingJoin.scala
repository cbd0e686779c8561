package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream–stream INTERVAL JOIN — the third leg of the streaming surface
  * beside windowed aggregation (StreamingRollup) and stateful dedup
  * (StreamingDedup/Funnel): two live streams joined on a key + an
  * event-time range, the real-time form of e14's click→purchase
  * attribution (and of j12's as-of enrichment when the window is
  * one-sided).
  *
  * State contract (Spark's stream-stream join requirements, public
  * docs/SPARK-24720): both inputs carry watermarks and the join
  * condition bounds event time in BOTH directions (p.ts ∈ [c.ts,
  * c.ts + 30 min]), so each side's join state is provably evictable —
  * a buffered click can stop waiting once the purchase-side watermark
  * passes c.ts + 30 min, and a buffered purchase once the click-side
  * watermark passes p.ts. Without the range bound the state grows
  * without limit and Spark rejects append mode outright; the interval
  * IS what makes the operator deployable on an unbounded 100 TB/day
  * feed. Input rows older than the current watermark are dropped at
  * admission — the spec pins both the drop and the eviction
  * observably.
  *
  * The same code runs UNCHANGED on batch frames (`withWatermark` is a
  * no-op there): the spec's batch twin is this very function, so
  * stream/batch parity is by construction, not by parallel
  * implementations.
  */
object StreamingJoin {

  /** clicks(ts, user_id, event_id) ⋈ purchases(ts, user_id, event_id):
    * every purchase within 30 minutes AFTER a click by the same user,
    * with the click→purchase lag. Inner join: append-mode-safe and
    * emits as soon as both sides arrive. */
  def attribute(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes").alias("c")
    val p = purchases.withWatermark("ts", "10 minutes").alias("p")
    c.join(p, expr(
      """c.user_id = p.user_id AND
        |p.ts >= c.ts AND
        |p.ts <= c.ts + INTERVAL 30 MINUTES""".stripMargin))
      .select(col("c.user_id").as("user_id"),
        col("c.event_id").as("click_id"),
        col("p.event_id").as("purchase_id"),
        (unix_micros(col("p.ts")) - unix_micros(col("c.ts"))).as("lag_us"))
  }
}
