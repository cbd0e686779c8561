package graft

import graft.streaming.StreamingRollup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** w12's incremental rollup under STREAMING delivery with a mid-stream
  * kill: the batch answer must be reproduced BIT-EXACTLY by the same
  * contribution code fed micro-batch-wise, stopped part-way, restarted
  * from its checkpoint, and folded. Exactness is the point of the IVM
  * design: counts and decimal sums are associative + commutative, so
  * no micro-batch split (including the one the kill produced) can move
  * a single bit of the maintained rollup. A wrong restart story — lost
  * batch, double-counted replay — moves n_orders or total_price and
  * the equality cannot hide it. */
class StreamingRollupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("streamed rollup maintenance == batch w12 across a mid-stream restart") {
    import spark.implicits._
    val base = graft.Scratch.tempDir("rollup")
    val (src, ckpt, state) = (s"$base/src", s"$base/ckpt", s"$base/state")

    // The delta feed split into 6 single-file slices on a key digit —
    // disjoint, exhaustive, deterministic micro-batch boundaries.
    val feed = graft.operators.WritePath.rollupDeltaFeed(spark, dir)
    val schema = feed.schema
    (0 until 6).foreach { i =>
      feed.filter(expr(s"(o_orderkey div 10) % 6") === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$src/slice$i")
    }

    // Run 1: make progress (>=2 delta batches), then kill mid-stream.
    val q1 = StreamingRollup.start(spark, s"$src/*", schema, ckpt, state,
      Trigger.ProcessingTime(0))
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (StreamingRollup.deltaBatches(spark, state) < 2 &&
           System.nanoTime() < deadline) Thread.sleep(100)
    q1.stop()
    val afterKill = StreamingRollup.deltaBatches(spark, state)
    assert(afterKill >= 2, "stream must have made progress before the kill")
    assert(afterKill < 6, "the kill must land mid-stream, not after completion")

    // Run 2: restart from the checkpoint, drain the rest.
    val q2 = StreamingRollup.start(spark, s"$src/*", schema, ckpt, state,
      Trigger.AvailableNow())
    q2.awaitTermination()
    assert(StreamingRollup.deltaBatches(spark, state) == 6)

    val streamed = StreamingRollup.maintained(spark, dir, state).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val batch = SparkEntry.queries("w12_incremental_rollup")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(streamed == batch, s"streamed $streamed != batch $batch")
  }

  test("a replayed delta micro-batch overwrites its own partial, never double-counts") {
    val base = graft.Scratch.tempDir("rollup_replay")
    val state = s"$base/state"
    val feed = graft.operators.WritePath.rollupDeltaFeed(spark, dir)
      .limit(100).localCheckpoint(true)
    StreamingRollup.processBatch(state)(feed, 0L)
    val once = StreamingRollup.maintained(spark, dir, state).collect().toSeq
    StreamingRollup.processBatch(state)(feed, 0L)
    val twice = StreamingRollup.maintained(spark, dir, state).collect().toSeq
    assert(once == twice)
    assert(StreamingRollup.deltaBatches(spark, state) == 1)
  }
}
