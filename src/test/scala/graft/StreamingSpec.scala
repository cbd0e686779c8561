package graft

import graft.streaming.StreamOps
import graft.streaming.StreamOps.{UserBalance, UserEvent}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming semantics with MemoryStream sources — the
  * streaming twins of graft.operators.Events (whose batch forms carry
  * the DuckDB oracle gate). */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")

  test("tumbling window counts over a stream") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    in.addData(
      (ts(1), 1L, "click", 1.0), (ts(2), 1L, "click", 2.0),
      (ts(6), 2L, "view", 3.0), (ts(21), 1L, "click", 4.0))
    val df = in.toDF().toDF("ts", "user_id", "event_type", "value")
    val out = StreamOps.runToMemory(spark, StreamOps.tumblingCounts(df),
      "tumbling_test", OutputMode.Complete())
      .orderBy("window_start", "event_type")
      .collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n") == 2)    // 00:00 window: 2 clicks
    assert(out(1).getAs[Long]("n") == 1)    // 00:05 window: 1 view
    assert(out(2).getAs[Long]("n") == 1)    // 00:20 window: 1 click
  }

  test("notification feed is a stateless append transform") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    in.addData((ts(1), 7L, "signup", 0.0), (ts(2), 7L, "view", 1.0),
      (ts(3), 8L, "error", 2.0))
    val df = in.toDF().toDF("ts", "user_id", "event_type", "value")
    val out = StreamOps.runToMemory(spark, StreamOps.notificationFeed(df),
      "feed_test", OutputMode.Append()).collect()
    assert(out.length == 2) // 'view' filtered out
    assert(out.forall(_.getAs[String]("message").startsWith("user ")))
  }

  test("mapGroupsWithState running balance matches the batch ledger") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[UserEvent]
    in.addData(
      UserEvent(1L, "purchase", 5.0), UserEvent(1L, "error", 2.0),
      UserEvent(1L, "view", 9.0), UserEvent(2L, "purchase", 1.0))
    val out = StreamOps.runToMemory(spark,
      StreamOps.runningBalance(in.toDS()).toDF(),
      "balance_test", OutputMode.Update())
      .orderBy("user_id").as[UserBalance].collect()
    assert(out.toSeq == Seq(UserBalance(1L, 3L, 13.0), UserBalance(2L, 1L, 11.0)))
  }

  test("transformWithState typed ledger: v1 parity, MapState recount, state survives a checkpoint restart") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import graft.streaming.StreamOps.TypedLedger
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // (a) v2 equals v1 on the balance columns over the same input —
      // the migration-parity proof for the new arbitrary-state API.
      val inA = MemoryStream[UserEvent]
      inA.addData(
        UserEvent(1L, "purchase", 5.0), UserEvent(1L, "error", 2.0),
        UserEvent(1L, "view", 9.0), UserEvent(2L, "purchase", 1.0))
      val v2 = StreamOps.runToMemory(spark,
        StreamOps.typedLedger(inA.toDS()).toDF(),
        "tl_parity", OutputMode.Update())
        .orderBy("user_id").as[TypedLedger].collect().toSeq
      assert(v2.map(l => UserBalance(l.user_id, l.n_events, l.coins))
        == Seq(UserBalance(1L, 3L, 13.0), UserBalance(2L, 1L, 11.0)))
      assert(v2 == Seq(TypedLedger(1L, 3L, 13.0, 1L, 1L),
        TypedLedger(2L, 1L, 11.0, 1L, 0L)))
      // (b) MapState counters recount against the real fixture log.
      val dir = "/root/testdata/sf0.001"
      val fixture = Tables(spark, dir).events
        .select($"user_id", $"event_type", $"value")
        .as[UserEvent].collect().toSeq
      val inB = MemoryStream[UserEvent]
      inB.addData(fixture)
      val ledger = StreamOps.runToMemory(spark,
        StreamOps.typedLedger(inB.toDS()).toDF(),
        "tl_fixture", OutputMode.Update())
        .as[TypedLedger].collect().map(l => l.user_id -> l).toMap
      val want = fixture.groupBy(_.user_id).map { case (u, es) =>
        u -> (es.size.toLong,
          es.count(_.event_type == "purchase").toLong,
          es.count(_.event_type == "error").toLong)
      }
      assert(ledger.keySet == want.keySet)
      want.foreach { case (u, (n, np, ne)) =>
        val l = ledger(u)
        assert((l.n_events, l.n_purchases, l.n_errors) == (n, np, ne), s"user $u")
      }
      // (c) A NEW query resuming the same checkpoint carries the
      // ValueState AND MapState forward: the second run's update for
      // user 1 is cumulative, not fresh.
      val baseDir = graft.Scratch.tempDir("tws")
      val (ckpt, sink) = (s"$baseDir/ckpt", s"$baseDir/sink")
      val inC = MemoryStream[UserEvent]
      def runOnce(): Unit = {
        // The memory sink cannot recover a checkpoint; foreachBatch can
        // (the StreamingFunnel recipe) — each micro-batch appends with
        // its batchId so the per-run outputs stay distinguishable.
        val q = StreamOps.typedLedger(inC.toDS()).toDF()
          .writeStream
          .outputMode(OutputMode.Update())
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
            df.withColumn("batch_id", lit(batchId))
              .write.mode("append").parquet(sink)
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      inC.addData(UserEvent(1L, "purchase", 5.0), UserEvent(2L, "purchase", 1.0))
      runOnce()
      inC.addData(UserEvent(1L, "error", 2.0), UserEvent(1L, "view", 9.0))
      runOnce() // a NEW query resuming the same checkpoint
      val byBatch = spark.read.parquet(sink)
        .orderBy("batch_id", "user_id").collect()
        .groupBy(_.getAs[Long]("batch_id")).view
        .mapValues(_.map(r => TypedLedger(r.getAs[Long]("user_id"),
          r.getAs[Long]("n_events"), r.getAs[Double]("coins"),
          r.getAs[Long]("n_purchases"), r.getAs[Long]("n_errors"))).toSeq)
        .toMap
      assert(byBatch(0L) == Seq(
        TypedLedger(1L, 1L, 15.0, 1L, 0L), TypedLedger(2L, 1L, 11.0, 1L, 0L)))
      // The restarted run's update for user 1 is CUMULATIVE: both the
      // ValueState balance and the MapState counters crossed the
      // restart through the RocksDB checkpoint.
      assert(byBatch.keySet.max > 0L)
      assert(byBatch(byBatch.keySet.max) == Seq(TypedLedger(1L, 3L, 13.0, 1L, 1L)))
    } finally {
      prev.fold(spark.conf.unset(providerKey))(v => spark.conf.set(providerKey, v))
    }
  }

  test("initial-state bootstrap: batch snapshot + streamed tail equals streaming the whole log") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import graft.streaming.StreamOps.TypedLedger
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = "/root/testdata/sf0.001"
      val all = Tables(spark, dir).events
        .orderBy($"ts", $"event_id")
        .select($"user_id", $"event_type", $"value")
        .as[UserEvent].collect().toSeq
      val (history, tail) = all.splitAt(all.length / 2)
      def delta(e: UserEvent): Double = e.event_type match {
        case "purchase" => e.value
        case "error"    => -e.value
        case _          => 0.0
      }
      // The batch-computed snapshot the stream adopts — with user 3
      // deliberately DROPPED to exercise the unseen-key fresh-start
      // path alongside the seeded path.
      val snapshot = history.groupBy(_.user_id).map { case (u, es) =>
        UserBalance(u, es.size.toLong, 10.0 + es.map(delta).sum)
      }.toSeq.filter(_.user_id != 3L)
      val in = MemoryStream[UserEvent]
      in.addData(tail)
      val got = StreamOps.runToMemory(spark,
        StreamOps.typedLedgerFrom(in.toDS(), snapshot.toDS()).toDF(),
        "tl_boot", OutputMode.Update())
        .as[UserBalance].collect()
        .map(l => l.user_id -> (l.n_events, l.coins)).toMap
      // Expected: seeded users continue from their history; user 3
      // starts from the fresh default (history forgotten by design).
      val want = tail.groupBy(_.user_id).map { case (u, es) =>
        val base = snapshot.find(_.user_id == u)
          .getOrElse(UserBalance(u, 0L, 10.0))
        u -> (base.n_events + es.size, base.coins + es.map(delta).sum)
      }
      assert(got.keySet == want.keySet)
      want.foreach { case (u, (n, coins)) =>
        assert(got(u)._1 == n, s"user $u n_events")
        assert(math.abs(got(u)._2 - coins) < 1e-9, s"user $u coins")
      }
      // And the seeded run over the tail must equal streaming the WHOLE
      // log from scratch for every user except the deliberately
      // forgotten one — the migration-safety algebra.
      val inAll = MemoryStream[UserEvent]
      inAll.addData(all)
      val scratch = StreamOps.runToMemory(spark,
        StreamOps.typedLedger(inAll.toDS()).toDF(),
        "tl_scratch", OutputMode.Update())
        .as[TypedLedger].collect()
        .map(l => l.user_id -> (l.n_events, l.coins)).toMap
      got.keys.filter(_ != 3L).foreach { u =>
        assert(got(u)._1 == scratch(u)._1, s"user $u n_events vs scratch")
        assert(math.abs(got(u)._2 - scratch(u)._2) < 1e-9, s"user $u coins vs scratch")
      }
    } finally {
      prev.fold(spark.conf.unset(providerKey))(v => spark.conf.set(providerKey, v))
    }
  }

  test("timer sessionization handles cross-batch out-of-order events: start extension and session bridging") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import graft.streaming.StreamOps.{SessionEmit, TimedEvent}
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ev(id: Long, u: Long, t: String): TimedEvent =
        TimedEvent(Timestamp.valueOf(t), id, u, "x")
      // Batch A: user 100 has two apparently separate sessions (10:00
      // and 10:12 — 12 min apart); user 200 opens at 10:07. Watermark
      // after A = 10:12 − 10 min = 10:02.
      val batchA = Seq(ev(1, 100, "2024-01-01 10:00:00"),
        ev(2, 100, "2024-01-01 10:12:00"), ev(3, 200, "2024-01-01 10:07:00"))
      // Batch B, both within the watermark: 10:05 BRIDGES user 100's
      // two sessions into one; 10:03 precedes user 200's open session
      // and must extend its START backwards.
      val batchB = Seq(ev(4, 100, "2024-01-01 10:05:00"),
        ev(5, 200, "2024-01-01 10:03:00"))
      val sentinels = Seq(ev(6, -1, "2024-03-01 00:00:00"),
        ev(7, -2, "2024-04-01 00:00:00"))
      val in = new MemoryStream[TimedEvent](
        scala.util.Random.nextInt(1 << 20) + (1 << 20), spark, Some(2))
      val baseDir = graft.Scratch.tempDir("tsooo")
      val (ckpt, sink) = (s"$baseDir/ckpt", s"$baseDir/sink")
      def runOnce(): Unit = {
        val q = StreamOps.timerSessions(in.toDS()).toDF()
          .writeStream.outputMode(OutputMode.Append())
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.write.mode("append").parquet(sink)
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      in.addData(batchA); runOnce()
      in.addData(batchB); runOnce()
      in.addData(sentinels(0)); runOnce()
      in.addData(sentinels(1)); runOnce()
      val got = spark.read.parquet(sink).as[SessionEmit].collect()
        .filter(_.user_id >= 0L)
        .map(s => (s.user_id, s.session_start.toString, s.n)).sorted.toSeq
      // One bridged 3-event session for user 100; user 200's session
      // starts at the LATE event's earlier time.
      assert(got == Seq(
        (100L, "2024-01-01 10:00:00.0", 3L),
        (200L, "2024-01-01 10:03:00.0", 2L)))
      // And session_window on the same rows agrees (the declarative
      // twin computes the same merge in batch mode).
      val want = StreamOps.sessionCounts((batchA ++ batchB).toDF())
        .as[(Long, Timestamp, Long)].collect()
        .map(t => (t._1, t._2.toString, t._3)).sorted.toSeq
      assert(got == want)
    } finally {
      prev.fold(spark.conf.unset(providerKey))(v => spark.conf.set(providerKey, v))
    }
  }

  test("timer sessionization equals the session_window aggregate on the full fixture log") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import graft.streaming.StreamOps.{SessionEmit, TimedEvent}
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = "/root/testdata/sf0.001"
      // Deliberately shuffled, multi-partition delivery: in-batch
      // ordering must come from the operator's sort, not the source.
      val fixture = new scala.util.Random(7).shuffle(
        Tables(spark, dir).events
          .select($"ts", $"event_id", $"user_id", $"event_type")
          .as[TimedEvent].collect().toSeq)
      val in = new MemoryStream[TimedEvent](
        scala.util.Random.nextInt(1 << 20) + (1 << 20), spark, Some(4))
      val baseDir = graft.Scratch.tempDir("tsess")
      val (ckpt, sink) = (s"$baseDir/ckpt", s"$baseDir/sink")
      def runOnce(): Unit = {
        val q = StreamOps.timerSessions(in.toDS()).toDF()
          .writeStream.outputMode(OutputMode.Append())
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            df.write.mode("append").parquet(sink)
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      in.addData(fixture)
      runOnce() // interior sessions emit; per-user tails await the watermark
      // Two sentinel batches: the watermark trails the PREVIOUS batch's
      // max event time, so closing every real tail session needs one
      // batch to raise the max and a second for the timers to see it.
      in.addData(TimedEvent(Timestamp.valueOf("2024-03-01 00:00:00"), -1L, -1L, "s"))
      runOnce()
      in.addData(TimedEvent(Timestamp.valueOf("2024-04-01 00:00:00"), -2L, -2L, "s"))
      runOnce()
      val got = spark.read.parquet(sink).as[SessionEmit].collect()
        .filter(_.user_id >= 0L)
        .map(s => (s.user_id, s.session_start, s.n)).sorted
      // The declarative twin on the SAME rows through the SAME code
      // path run as a batch (withWatermark is a batch no-op).
      val want = StreamOps.sessionCounts(fixture.toDF())
        .as[(Long, Timestamp, Long)].collect().toSeq
        .map(t => (t._1, t._2, t._3)).sorted
      assert(got.length == want.length)
      assert(got.toSeq == want)
    } finally {
      prev.fold(spark.conf.unset(providerKey))(v => spark.conf.set(providerKey, v))
    }
  }

  test("flatMapGroupsWithState transitions match the batch e12 matrix") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import graft.streaming.StreamOps.Transition
    // Feed the REAL fixture event log DELIBERATELY out of order and
    // over multiple input partitions — the operator's (ts, event_id)
    // in-batch sort, not source ordering, must recover event time.
    val dir = "/root/testdata/sf0.001"
    val fixture = new scala.util.Random(42).shuffle(
      Tables(spark, dir).events
        .select($"ts", $"event_id", $"user_id", $"event_type")
        .as[StreamOps.TimedEvent].collect().toSeq)
    val in = new MemoryStream[StreamOps.TimedEvent](
      scala.util.Random.nextInt(1 << 20) + (1 << 20), spark, Some(4))
    in.addData(fixture)
    val pairs = StreamOps.runToMemory(spark,
      StreamOps.transitionPairs(in.toDS()).toDF(),
      "transition_test", OutputMode.Append())
      .as[Transition].collect()
    val streamCounts = pairs.groupBy(t => (t.prev_type, t.next_type))
      .view.mapValues(_.length.toLong).toMap
    // ... and require the exact counts the batch window form computes.
    val batch = graft.operators.Events.queries("e12_transition_matrix")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamCounts == batch)
  }

  test("checkpointed file stream is exactly-once across restarts") {
    import spark.implicits._
    val base = graft.Scratch.tempDir("ckpt")
    val (src, sink, ckpt) = (s"$base/src", s"$base/sink", s"$base/ckpt")
    def writeBatch(rows: Seq[(Long, String)]): Unit =
      rows.toDF("user_id", "event_type").write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("user_id BIGINT, event_type STRING").parquet(src)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    writeBatch(Seq((1L, "click"), (2L, "view"), (3L, "click")))
    runOnce()
    assert(spark.read.parquet(sink).count() == 3)
    writeBatch(Seq((4L, "purchase"), (5L, "error")))
    runOnce() // restart from checkpoint: only the new file is processed
    assert(spark.read.parquet(sink).count() == 5)
    assert(spark.read.parquet(sink).select("user_id").distinct().count() == 5)
  }

  test("same transform runs on a real file stream (readStream over parquet)") {
    import spark.implicits._
    // Unified batch/stream Dataset model: tumblingCounts is the SAME
    // function the batch oracle-checked query family uses; here it runs
    // over a file-source stream of the actual fixture.
    val batchEvents = Tables(spark, "/root/testdata/sf0.001").events
      .select($"ts", $"user_id", $"event_type", $"value")
    val tmpIn = graft.Scratch.tempDir("stream_in")
    batchEvents.write.mode("overwrite").parquet(tmpIn)
    val streamIn = spark.readStream
      .schema(batchEvents.schema)
      .parquet(tmpIn)
    val out = StreamOps.runToMemory(spark, StreamOps.tumblingCounts(streamIn),
      "file_stream_test", OutputMode.Complete())
    val batchTotal = batchEvents.count()
    val streamTotal = out.agg(org.apache.spark.sql.functions.sum("n"))
      .head().getLong(0)
    assert(streamTotal == batchTotal)
  }

  test("flatMapGroupsWithState emits only threshold-crossing alerts") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[StreamOps.UserEvent]
    in.addData(
      StreamOps.UserEvent(1L, "error", 15.0),     // 10 → -5: overdraft
      StreamOps.UserEvent(2L, "purchase", 95.0),  // 10 → 105: high_balance
      StreamOps.UserEvent(3L, "view", 50.0))      // no alert
    val out = StreamOps.runToMemory(spark,
      StreamOps.balanceAlerts(in.toDS()).toDF(),
      "alerts_test", OutputMode.Append())
      .orderBy("user_id").collect()
    assert(out.map(_.getAs[String]("reason")).toSeq == Seq("overdraft", "high_balance"))
  }

  test("watermark drops events later than the lateness bound") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    val agg = StreamOps.tumblingCounts(in.toDF().toDF("ts", "user_id", "event_type", "value"))
    val q = agg.writeStream.format("memory").queryName("late_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // Batch 1 advances the watermark to 00:50 − 10m = 00:40.
      in.addData((ts(50), 1L, "click", 1.0))
      q.processAllAvailable()
      // Batch 2: an event at 00:02 is far behind the watermark → dropped;
      // one at 00:45 is within bounds → kept.
      in.addData((ts(2), 1L, "click", 1.0), (ts(45), 1L, "click", 1.0))
      q.processAllAvailable()
      // Batch 3 pushes the watermark (01:05 − 10m = 00:55) past the ends
      // of the [00:45,00:50) and [00:50,00:55) windows, flushing them —
      // append mode only emits windows whose end < watermark.
      in.addData((Timestamp.valueOf("2024-01-01 01:05:00"), 1L, "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("late_test").collect()
      .map(r => (r.getAs[Timestamp]("window_start"), r.getAs[Long]("n"))).toMap
    assert(!rows.contains(ts(0)), s"late event must be dropped: $rows")   // 00:00 window never emitted
    assert(rows.get(ts(45)).contains(1L), s"in-bounds event kept: $rows") // 00:45 window
  }

  test("stream-static join enriches a stream against a dimension table") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val users = Seq((1L, "ada"), (2L, "grace")).toDF("user_id", "user_name")
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    in.addData((ts(1), 1L, "click", 1.0), (ts(2), 9L, "click", 2.0))
    val df = in.toDF().toDF("ts", "user_id", "event_type", "value")
    val out = StreamOps.runToMemory(spark,
      StreamOps.enrichWithDimension(df, users),
      "enrich_test", OutputMode.Append())
      .orderBy("user_id").collect()
    assert(out(0).getAs[String]("user_name") == "ada")
    assert(out(1).getAs[String]("user_name") == "Unknown User") // J2 default
  }

  test("streaming dedup drops within-watermark duplicate keys, keeps the first") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    in.addData(
      (ts(1), 1L, "click", 1.0), (ts(2), 1L, "click", 2.0), // dup key (1,click)
      (ts(3), 1L, "view", 3.0), (ts(4), 2L, "click", 4.0))
    val df = in.toDF().toDF("ts", "user_id", "event_type", "value")
    val out = StreamOps.runToMemory(spark, StreamOps.dedupStream(df),
      "dedup_stream_test", OutputMode.Append())
      .orderBy("user_id", "event_type").collect()
    assert(out.length == 3) // (1,click) deduped, first occurrence kept
    val kept = out.find(r => r.getAs[Long]("user_id") == 1L
      && r.getAs[String]("event_type") == "click").get
    assert(kept.getAs[Double]("value") == 1.0)
  }

  test("stream-stream interval join matches purchases to recent clicks only") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, String, Double)]
    val purchases = MemoryStream[(Timestamp, Long, String, Double)]
    clicks.addData((ts(1), 1L, "click", 1.0), (ts(20), 2L, "click", 2.0))
    purchases.addData(
      (ts(4), 1L, "purchase", 10.0),  // 3 min after user 1's click → joins
      (ts(9), 1L, "purchase", 20.0),  // 8 min after → outside 5-min bound
      (ts(21), 3L, "purchase", 30.0)) // no click from user 3
    val out = StreamOps.runToMemory(spark,
      StreamOps.clickToPurchaseJoin(
        clicks.toDF().toDF("ts", "user_id", "event_type", "value"),
        purchases.toDF().toDF("ts", "user_id", "event_type", "value")),
      "ss_join_test", OutputMode.Append()).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("user_id") == 1L)
    assert(out(0).getAs[Double]("purchase_value") == 10.0)
  }

  test("foreachBatch upsert maintains a latest-per-key snapshot across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val path = graft.Scratch.dir("upsert_snapshot")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val in = MemoryStream[(Long, Timestamp, Double)]
    val q = in.toDF().toDF("user_id", "ts", "balance")
      .writeStream
      .foreachBatch(StreamOps.upsertBatch(path, "user_id", "ts") _)
      .start()
    // Batch 1: two users.
    in.addData((1L, ts(1), 10.0), (2L, ts(1), 20.0))
    q.processAllAvailable()
    // Batch 2: user 1 updated, user 3 new, and a LATE row for user 2
    // (older ts) that must NOT overwrite the snapshot.
    in.addData((1L, ts(5), 15.0), (3L, ts(5), 30.0), (2L, ts(0), 99.0))
    q.processAllAvailable()
    q.stop()
    val snap = spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(snap == Map(1L -> 15.0, 2L -> 20.0, 3L -> 30.0))
  }

  test("session window groups events by 10-minute gaps") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    // user 1: events at 00:01, 00:05 (one session), 00:30 (new session)
    in.addData((ts(1), 1L, "click", 1.0), (ts(5), 1L, "click", 1.0),
      (ts(30), 1L, "click", 1.0))
    val df = in.toDF().toDF("ts", "user_id", "event_type", "value")
    val out = StreamOps.runToMemory(spark, StreamOps.sessionCounts(df),
      "session_test", OutputMode.Complete())
      .orderBy("session_start").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n") == 2 && out(1).getAs[Long]("n") == 1)
  }

  test("state TTL: within-TTL updates accumulate, an aged key is evicted and restarts fresh") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // A processing-time-mode query NEVER self-terminates: processing
      // time always advances, so `shouldRunAnotherBatch` stays true and
      // the engine keeps scheduling (empty) batches — that is the
      // mechanism that fires timers and expires TTL without input.
      // Neither processAllAvailable (no-new-data never latches) nor
      // Trigger.AvailableNow (termination condition never met) returns
      // for such a query, so the test runs ONE continuous query with an
      // interval trigger, polls the sink, and stops it explicitly —
      // exactly the production shape for TTL'd state.
      val ttlMs = 8000L
      val in = MemoryStream[UserEvent]
      val q = StreamOps.ttlCounter(in.toDS(), ttlMs).toDF()
        .writeStream.format("memory").queryName("ttl_probe")
        .outputMode(OutputMode.Update())
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
        .start()
      try {
        def rowsSoFar(): Seq[(Long, Long, Boolean)] =
          spark.table("ttl_probe").collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
        def awaitRows(n: Int): Seq[(Long, Long, Boolean)] = {
          val deadline = System.nanoTime() + 120e9.toLong
          var rows = rowsSoFar()
          while (rows.length < n && System.nanoTime() < deadline) {
            Thread.sleep(200); rows = rowsSoFar()
          }
          assert(rows.length >= n, s"sink stuck at $rows waiting for $n")
          rows
        }
        in.addData(UserEvent(1L, "view", 0.0), UserEvent(1L, "view", 0.0),
          UserEvent(1L, "view", 0.0))
        awaitRows(1)
        // Well inside the TTL: the value persists, the counter RESUMES.
        in.addData(UserEvent(1L, "view", 0.0), UserEvent(1L, "view", 0.0))
        assert(awaitRows(2) == Seq((1L, 3L, false), (1L, 5L, true)))
        // Let the TTL lapse with the query idling: the store evicts the
        // value, the next read sees not-exists and the key restarts
        // from zero — the bounded-state contract for keys that go
        // quiet.
        Thread.sleep(ttlMs + 4000L)
        in.addData(UserEvent(1L, "view", 0.0))
        val all = awaitRows(3)
        assert(all.last == ((1L, 1L, false)),
          s"aged state was served instead of evicted: $all")
      } finally q.stop()
    } finally {
      prev.fold(spark.conf.unset(providerKey))(v => spark.conf.set(providerKey, v))
    }
  }

  test("changelog checkpointing (v2 format): state crosses a restart via per-batch deltas") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import graft.streaming.StreamOps.TypedLedger
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val changelogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prevP = spark.conf.getOption(providerKey)
    val prevC = spark.conf.getOption(changelogKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(changelogKey, "true")
    try {
      val baseDir = graft.Scratch.tempDir("tws_changelog")
      val (ckpt, sink) = (s"$baseDir/ckpt", s"$baseDir/sink")
      val in = MemoryStream[UserEvent]
      def runOnce(): Unit = {
        val q = StreamOps.typedLedger(in.toDS()).toDF()
          .writeStream
          .outputMode(OutputMode.Update())
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
            df.withColumn("batch_id", lit(batchId))
              .write.mode("append").parquet(sink)
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      in.addData(UserEvent(7L, "purchase", 5.0))
      runOnce()
      in.addData(UserEvent(7L, "error", 2.0))
      runOnce() // a NEW query recovers from the changelog checkpoint
      val rows = spark.read.parquet(sink).collect()
        .map(r => (r.getAs[Long]("batch_id"), TypedLedger(r.getAs[Long]("user_id"),
          r.getAs[Long]("n_events"), r.getAs[Double]("coins"),
          r.getAs[Long]("n_purchases"), r.getAs[Long]("n_errors"))))
        .sortBy(_._1)
      // Cumulative across the restart: recovery replayed the per-batch
      // DELTA files, not a fresh store.
      assert(rows.head._2 == TypedLedger(7L, 1L, 15.0, 1L, 0L))
      assert(rows.last._2 == TypedLedger(7L, 2L, 13.0, 1L, 1L), rows.mkString(","))
      // The checkpoint really is in the changelog format: version
      // deltas land as <v>.changelog files under the state store dir.
      val changelogs = new java.io.File(s"$ckpt/state")
      def findChangelogs(f: java.io.File): Int =
        if (f.isFile) (if (f.getName.endsWith(".changelog")) 1 else 0)
        else Option(f.listFiles()).getOrElse(Array.empty).map(findChangelogs).sum
      assert(findChangelogs(changelogs) > 0,
        "no .changelog files — checkpoint fell back to full-snapshot format")
    } finally {
      prevP.fold(spark.conf.unset(providerKey))(v => spark.conf.set(providerKey, v))
      prevC.fold(spark.conf.unset(changelogKey))(v => spark.conf.set(changelogKey, v))
    }
  }
}
