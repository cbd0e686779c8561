package graft

import graft.streaming.StreamingFunnel
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The ingest funnel under STREAMING delivery with a mid-stream kill:
  * pipe2's batch answer must be reproduced count-exactly by the same
  * stage code fed micro-batch-wise, stopped part-way, and restarted
  * from its checkpoint (VERDICT r5 #7).
  *
  * Why count-exact equality is the right assertion (and possible at
  * all): the funnel's four numbers are invariant to micro-batch
  * splits — exact-dedup survivorship counts each distinct unseen hash
  * once whichever copy arrives first, and the near-dup/quality flags
  * are text-local, so identical-text copies carry identical flags (see
  * Dedup.funnelCounts). A wrong restart story (lost batch, replayed
  * batch double-counted, replay seeing its own seen-hashes) moves
  * n_batch or marks whole batches duplicate — the totals cannot hide
  * it. */
class StreamingFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("streamed funnel == batch pipe2 across a mid-stream restart") {
    import spark.implicits._
    val base = graft.Scratch.tempDir("funnel")
    val (src, ckpt, state) = (s"$base/src", s"$base/ckpt", s"$base/state")

    // The batch half (doc_id odd) split into 6 single-file slices —
    // maxFilesPerTrigger=1 then yields 6 deterministic micro-batches.
    val batchDocs = Tables(spark, dir).documents.filter($"doc_id" % 2 === 1)
    val schema = batchDocs.schema
    // Odd doc_ids take the 6 odd residues mod 12 — disjoint, exhaustive.
    (0 until 6).foreach { i =>
      batchDocs.filter($"doc_id" % 12 === 2 * i + 1)
        .coalesce(1).write.mode("overwrite").parquet(s"$src/slice$i")
    }

    // Run 1: process micro-batches until at least 2 are on the ledger,
    // then kill the query — possibly mid-batch, which is the point: the
    // interrupted batch must replay idempotently after restart.
    val q1 = StreamingFunnel.start(spark, dir, s"$src/*", schema, ckpt, state,
      Trigger.ProcessingTime(0))
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (StreamingFunnel.ledgerBatches(spark, state) < 2 &&
           System.nanoTime() < deadline) Thread.sleep(100)
    q1.stop()
    val afterKill = StreamingFunnel.ledgerBatches(spark, state)
    assert(afterKill >= 2, "stream must have made progress before the kill")
    assert(afterKill < 6, "the kill must land mid-stream, not after completion")

    // Run 2: restart from the checkpoint, drain the remaining files.
    val q2 = StreamingFunnel.start(spark, dir, s"$src/*", schema, ckpt, state,
      Trigger.AvailableNow())
    q2.awaitTermination()
    assert(StreamingFunnel.ledgerBatches(spark, state) == 6,
      "every slice lands exactly one ledger batch after restart")

    val streamed = StreamingFunnel.funnelTotals(spark, state)
      .head().toSeq
    val batch = SparkEntry.queries("pipe2_incremental_ingest")(spark, dir)
      .head().toSeq
    assert(streamed == batch,
      s"streamed funnel $streamed != batch pipe2 $batch")
  }

  test("a replayed micro-batch overwrites its own state, never double-counts") {
    import spark.implicits._
    val base = graft.Scratch.tempDir("replay")
    val state = s"$base/state"
    val batchDocs = Tables(spark, dir).documents
      .filter($"doc_id" % 2 === 1).limit(40).localCheckpoint(true)
    // First attempt of batch 0, then its replay (same id, same rows) —
    // the failure-recovery path foreachBatch contracts to be idempotent.
    StreamingFunnel.processBatch(dir, state)(batchDocs, 0L)
    val once = StreamingFunnel.funnelTotals(spark, state).head().toSeq
    StreamingFunnel.processBatch(dir, state)(batchDocs, 0L)
    val twice = StreamingFunnel.funnelTotals(spark, state).head().toSeq
    assert(once == twice)
    assert(StreamingFunnel.ledgerBatches(spark, state) == 1)
    // ... and batch 1 with the SAME documents sees them all as dups of
    // batch 0 (the seen-store actually carries state forward).
    StreamingFunnel.processBatch(dir, state)(batchDocs, 1L)
    val b1 = spark.read.parquet(s"$state/ledger/1").head()
    assert(b1.getAs[Long]("n_after_exact") == 0L)
  }
}
