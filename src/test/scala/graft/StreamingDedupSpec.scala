package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Native state-store dedup under at-least-once delivery: overlapping
  * re-deliveries of the same rows across micro-batches must land each
  * key EXACTLY once, across a mid-stream kill/restart (the state store
  * restores first-seen keys from the checkpoint; the sink manifest
  * de-duplicates replayed batch output). Complements
  * StreamingFunnelSpec, which proves the same contract for the
  * user-space (foreachBatch) posture. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("at-least-once delivery -> exactly-once store, across a mid-stream restart") {
    import spark.implicits._
    val base = graft.Scratch.tempDir("sdedup")
    val (src, ckpt, out) = (s"$base/src", s"$base/ckpt", s"$base/out")

    val docs = Tables(spark, dir).documents
      .select($"doc_id", $"text", $"lang", $"source")
    val schema = docs.schema
    val total = docs.count()
    // Six slices with HEAVY overlap (each key delivered 2-3 times):
    // slices i and i+1 share half their rows, and the last slice is a
    // full replay of everything — the at-least-once upstream.
    val slices = (0 until 5).map { i =>
      docs.filter($"doc_id" % 10 === 2 * i || $"doc_id" % 10 === (2 * i + 2) % 10
        || $"doc_id" % 10 === 2 * i + 1)
    } :+ docs
    var delivered = 0L
    slices.zipWithIndex.foreach { case (s, i) =>
      delivered += s.count()
      s.coalesce(1).write.mode("overwrite").parquet(s"$src/slice$i")
      Thread.sleep(5) // distinct mtimes: oldest-first = slice order
    }
    assert(delivered > total, "input must actually re-deliver rows")

    // Run 1: let at least one micro-batch commit, then kill.
    val q1 = StreamingDedup.start(spark, s"$src/*", schema, "doc_id",
      ckpt, out, Trigger.ProcessingTime(0))
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (StreamingDedup.committedBatches(spark, out) < 1 &&
           System.nanoTime() < deadline) Thread.sleep(50)
    q1.stop()
    assert(StreamingDedup.committedBatches(spark, out) >= 1,
      "stream must have made progress before the kill")

    // Run 2: restart from the checkpoint, drain everything remaining.
    val q2 = StreamingDedup.start(spark, s"$src/*", schema, "doc_id",
      ckpt, out, Trigger.AvailableNow())
    q2.awaitTermination()
    assert(StreamingDedup.committedBatches(spark, out) == 6,
      "each slice commits exactly one micro-batch")

    // Exactly-once: every key once, rows identical to the batch corpus.
    val got = StreamingDedup.result(spark, out)
    assert(got.count() == total)
    assert(got.select($"doc_id").distinct().count() == total)
    val gotRows = got.collect().map(_.toSeq.toVector).toSet
    val expRows = docs.collect().map(_.toSeq.toVector).toSet
    assert(gotRows == expRows)
  }
}
