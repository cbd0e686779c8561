package graft

import graft.streaming.StreamOps
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Deep contracts of the stream–stream interval join
  * (StreamOps.clickToPurchaseJoin; basic exclusions are covered in
  * StreamingSpec): (1) stream/batch PARITY — the same function run
  * over batch frames (where withWatermark is a no-op) must emit the
  * identical row set, so the streaming form is the batch semantics
  * plus state management, not a parallel implementation; (2) the
  * WATERMARK contract, observably — input arriving behind the
  * advanced watermark is dropped rather than joined against evicted
  * state, while the batch twin (which has no watermark) still joins
  * it. */
class StreamingJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  // (ts, user_id, event_type, value)
  private type Ev = (Timestamp, Long, String, Double)

  private def frame(rows: Seq[Ev]): DataFrame = {
    import spark.implicits._
    rows.toDF("ts", "user_id", "event_type", "value")
  }

  test("streaming result == batch twin of the SAME function; boundary included, order/key/window exclusions hold") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val clicks: Seq[Ev] = Seq(
      (ts(0), 1L, "click", 1.0),   // matched at +3 and at exactly +5
      (ts(10), 2L, "click", 2.0),  // user 2: purchase BEFORE the click
      (ts(40), 1L, "click", 3.0))  // matched once; +6min purchase excluded
    val purchases: Seq[Ev] = Seq(
      (ts(3), 1L, "purchase", 10.0),  // in-window for click@0
      (ts(5), 1L, "purchase", 11.0),  // exactly +5min: boundary INCLUDED
      (ts(8), 2L, "purchase", 12.0),  // before user 2's click: excluded
      (ts(12), 3L, "purchase", 13.0), // user 3 never clicked
      (ts(42), 1L, "purchase", 14.0), // in-window for click@40
      (ts(46), 1L, "purchase", 15.0)) // +6min: outside the 5-min window
    val cIn = MemoryStream[Ev]; val pIn = MemoryStream[Ev]
    cIn.addData(clicks); pIn.addData(purchases)
    val got = StreamOps.runToMemory(spark,
      StreamOps.clickToPurchaseJoin(
        cIn.toDF().toDF("ts", "user_id", "event_type", "value"),
        pIn.toDF().toDF("ts", "user_id", "event_type", "value")),
      "ssj_parity", OutputMode.Append())
      .collect().map(_.toSeq.toVector).toSet
    val want = StreamOps.clickToPurchaseJoin(frame(clicks), frame(purchases))
      .collect().map(_.toSeq.toVector).toSet
    assert(got == want, "stream and batch twins must emit identical rows")
    // The exclusions are real: 3 joins survive from 3×6 candidate pairs.
    assert(got.map(r => (r(3), r(4))) ==
      Set((1.0, 10.0), (1.0, 11.0), (3.0, 14.0)))
  }

  test("late input behind the watermark is dropped; the batch twin still joins it") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val cIn = MemoryStream[Ev]; val pIn = MemoryStream[Ev]
    val liveClick: Seq[Ev] = Seq((ts(100), 5L, "click", 1.0))
    val livePurch: Seq[Ev] = Seq((ts(103), 5L, "purchase", 50.0))
    val earlyPurch: Seq[Ev] = Seq((ts(2), 6L, "purchase", 60.0))
    // Arrives in batch 2, 100 min behind the watermark (103 − 10 min
    // delay ⇒ ~minute 93 after batch 1 commits).
    val lateClick: Seq[Ev] = Seq((ts(0), 6L, "click", 2.0))

    val out = StreamOps.clickToPurchaseJoin(
      cIn.toDF().toDF("ts", "user_id", "event_type", "value"),
      pIn.toDF().toDF("ts", "user_id", "event_type", "value"))
    val q = out.writeStream.format("memory").queryName("ssj_late")
      .outputMode(OutputMode.Append()).start()
    try {
      cIn.addData(liveClick); pIn.addData(livePurch ++ earlyPurch)
      q.processAllAvailable()
      cIn.addData(lateClick)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("ssj_late").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("purchase_value"))).toSet
    val want = StreamOps.clickToPurchaseJoin(
      frame(liveClick ++ lateClick), frame(livePurch ++ earlyPurch))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("purchase_value"))).toSet
    assert(want == Set((5L, 50.0), (6L, 60.0)), "batch twin joins the late pair")
    assert(got == Set((5L, 50.0)), "stream drops input behind the watermark")
  }
}
