package graft

import graft.streaming.StreamingJoin
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Stream–stream interval join: result parity with the batch twin (the
  * SAME function over batch frames), multi-match fan-out, window and
  * key exclusions, and the watermark contract — a row arriving behind
  * the watermark is dropped rather than joined against evicted state. */
class StreamingJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  // (ts, user_id, event_id)
  private type Ev = (Timestamp, Long, Long)

  private def frame(rows: Seq[Ev]) = {
    import spark.implicits._
    rows.toDF("ts", "user_id", "event_id")
  }

  test("streaming result == batch twin; window, key and order exclusions hold") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val clicks: Seq[Ev] = Seq(
      (ts(0), 1L, 100L),   // matched by purchases at +5 and +30 (boundary)
      (ts(10), 2L, 101L),  // cross-user: user 3's purchase must not match
      (ts(40), 1L, 102L))  // matched once; its +31min purchase excluded
    val purchases: Seq[Ev] = Seq(
      (ts(5), 1L, 200L),   // in-window for click 100
      (ts(30), 1L, 201L),  // exactly +30min: boundary INCLUDED for click 100
      (ts(12), 3L, 202L),  // user 3 — no click
      (ts(8), 2L, 203L),   // BEFORE user 2's click: excluded (p.ts >= c.ts)
      (ts(45), 1L, 204L),  // in-window for click 102
      (ts(72), 1L, 205L))  // +32min after click 102: outside window
    val cIn = MemoryStream[Ev]; val pIn = MemoryStream[Ev]
    cIn.addData(clicks); pIn.addData(purchases)
    val got = graft.streaming.StreamOps.runToMemory(spark,
      StreamingJoin.attribute(
        cIn.toDF().toDF("ts", "user_id", "event_id"),
        pIn.toDF().toDF("ts", "user_id", "event_id")),
      "ssj_parity", OutputMode.Append())
      .collect().map(_.toSeq.toVector).toSet
    val want = StreamingJoin.attribute(frame(clicks), frame(purchases))
      .collect().map(_.toSeq.toVector).toSet
    assert(got == want, "stream and batch twins must emit identical rows")
    // The exclusions are real: exactly 3 joins survive from 3×6 pairs.
    assert(got.map(r => (r(1), r(2))) ==
      Set((100L, 200L), (100L, 201L), (102L, 204L)))
  }

  test("late input behind the watermark is dropped; batch twin still joins it") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val cIn = MemoryStream[Ev]; val pIn = MemoryStream[Ev]
    val liveClicks: Seq[Ev] = Seq((ts(100), 5L, 300L))
    val livePurch: Seq[Ev] = Seq((ts(105), 5L, 400L))
    // The late pair: a click at minute 0 arriving AFTER the watermark
    // has advanced to ~minute 95 (event time 105 − 10 min delay).
    val lateClick: Seq[Ev] = Seq((ts(0), 6L, 301L))
    val earlyPurch: Seq[Ev] = Seq((ts(2), 6L, 401L))

    val out = StreamingJoin.attribute(
      cIn.toDF().toDF("ts", "user_id", "event_id"),
      pIn.toDF().toDF("ts", "user_id", "event_id"))
    val q = out.writeStream.format("memory").queryName("ssj_late")
      .outputMode(OutputMode.Append()).start()
    try {
      // Batch 1 delivers user 6's purchase early plus the live pair —
      // the watermark advances past minute 0 once this batch commits.
      cIn.addData(liveClicks); pIn.addData(livePurch ++ earlyPurch)
      q.processAllAvailable()
      // Batch 2 delivers the user-6 click 100 minutes late.
      cIn.addData(lateClick)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("ssj_late").collect().map(_.toSeq.toVector).toSet
    val want = StreamingJoin.attribute(
      frame(liveClicks ++ lateClick), frame(livePurch ++ earlyPurch))
      .collect().map(_.toSeq.toVector).toSet
    // Batch semantics join the late pair; the stream provably dropped it.
    assert(want.exists(_(1) == 301L), "batch twin joins the late pair")
    assert(!got.exists(_(1) == 301L), "stream drops input behind the watermark")
    assert(got.exists(_(1) == 300L), "the live pair still joins")
  }
}
