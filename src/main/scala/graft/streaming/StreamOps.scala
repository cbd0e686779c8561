package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** M5 — Structured Streaming formulations (SURVEY.md §2.9). The
  * reference's only "stream" is the notifications feed: append at
  * index.js:60, poll-newest-first at index.js:229-232 — micro-batch by
  * polling, no watermarks, windows, or state. These operators give the
  * engine the real streaming semantics that pattern generalizes to,
  * each mirroring a batch query in `graft.operators.Events` (the DuckDB
  * oracle can't replay streams, so the batch twins carry the
  * correctness gate; ScalaTest drives these with MemoryStream).
  *
  * All transforms take a DataFrame and return one, so the same code
  * runs on `readStream` (streaming) and `read` (batch) inputs —
  * Spark's unified Dataset model. Scale: watermarked window aggregation
  * keeps state bounded to in-flight windows per key; state store is
  * partitioned by group key, so 1000 executors shard it naturally.
  */
object StreamOps {

  /** Schema of the events feed: (ts timestamp, user_id long,
    * event_type string, value double). */

  /** Tumbling 5-minute counts per event type, 10-minute watermark:
    * late events beyond the watermark are dropped, windows finalize
    * (and emit, in Append mode) once the watermark passes their end. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session windows per user (10-minute gap), watermarked. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n"))

  /** The notification feed analog: stateless transform, Append-mode
    * sink — the reference's insert-then-poll loop as a push stream. */
  def notificationFeed(events: DataFrame): DataFrame =
    events
      .filter(col("event_type").isin("signup", "purchase", "error"))
      .select(
        col("ts").as("time"),
        concat(lit("user "), col("user_id"), lit(" "), col("event_type"),
          lit(" ("), col("value"), lit(")")).as("message"),
        col("user_id").as("to_user"))

  /** Stream-static join: enrich a stream against a static dimension
    * DataFrame (the J2 enrichment pattern with a streaming probe side).
    * Spark broadcasts/rescans the static side per micro-batch; no state
    * store involved — the scalable default for dimension enrichment. */
  def enrichWithDimension(events: DataFrame, users: DataFrame): DataFrame =
    events.join(broadcast(users), Seq("user_id"), "left_outer")
      .select(col("ts"), col("user_id"),
        coalesce(col("user_name"), lit("Unknown User")).as("user_name"),
        col("event_type"), col("value"))

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserBalance(user_id: Long, n_events: Long, coins: Double)

  /** Custom keyed state via mapGroupsWithState: the `$inc` coin ledger
    * (index.js:834-837 et al.) as streaming state — running balance =
    * 10 + purchases − errors, updated per micro-batch. */
  def runningBalance(events: Dataset[UserEvent]): Dataset[UserBalance] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserBalance, UserBalance](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserBalance]) =>
          val prev = state.getOption.getOrElse(UserBalance(userId, 0L, 10.0))
          val next = rows.foldLeft(prev) { (acc, e) =>
            val delta = e.event_type match {
              case "purchase" => e.value
              case "error"    => -e.value
              case _          => 0.0
            }
            UserBalance(userId, acc.n_events + 1, acc.coins + delta)
          }
          state.update(next)
          next
      }
  }

  final case class BalanceAlert(user_id: Long, coins: Double, reason: String)

  /** flatMapGroupsWithState — the zero-or-more-outputs variant: maintain
    * the running balance but EMIT only threshold-crossing alerts
    * (overdraft / high-value), the shape of a streaming rules engine.
    * State lives per key in the state store; emission count is
    * decoupled from input count. */
  def balanceAlerts(events: Dataset[UserEvent]): Dataset[BalanceAlert] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserBalance, BalanceAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserBalance]) =>
          var bal = state.getOption.getOrElse(UserBalance(userId, 0L, 10.0))
          val alerts = Seq.newBuilder[BalanceAlert]
          rows.foreach { e =>
            val delta = e.event_type match {
              case "purchase" => e.value
              case "error"    => -e.value
              case _          => 0.0
            }
            val next = UserBalance(userId, bal.n_events + 1, bal.coins + delta)
            if (bal.coins >= 0 && next.coins < 0)
              alerts += BalanceAlert(userId, next.coins, "overdraft")
            if (next.coins >= 100.0 && bal.coins < 100.0)
              alerts += BalanceAlert(userId, next.coins, "high_balance")
            bal = next
          }
          state.update(bal)
          alerts.result().iterator
      }
  }

  final case class TypedLedger(user_id: Long, n_events: Long, coins: Double,
                               n_purchases: Long, n_errors: Long)

  /** transformWithState — Spark 4's arbitrary-state API v2 (SPARK-46815),
    * the successor to mapGroupsWithState, run here as the SAME ledger so
    * the migration is provable: the v1 operator keeps one opaque state
    * blob per key (every update rewrites the whole value), while this
    * processor composes TYPED state primitives — a ValueState for the
    * running balance plus a MapState for per-event-type counters whose
    * updates are POINT writes to one map entry. At 100 TB-of-stream
    * scale that's the difference that matters: a key with a wide
    * counter map pays one RocksDB point-put per event instead of
    * re-serializing the full map, TTL policies attach per state (not
    * per operator), and timers exist for time-driven emission. The
    * state store requirement (RocksDB provider) is part of the same
    * design — point state ops against an LSM store, sharded by key
    * across executors exactly like the v1 store. StreamingSpec proves
    * v1 ≡ v2 on the balance columns over identical multi-batch input,
    * the MapState counters against a batch recount, and state survival
    * across a kill/restart from checkpoint. */
  class LedgerProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, UserEvent, TypedLedger] {
    import org.apache.spark.sql.streaming.{MapState, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var balance: ValueState[UserBalance] = _
    @transient private var byType: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      balance = getHandle.getValueState[UserBalance](
        "balance", Encoders.product[UserBalance], TTLConfig.NONE)
      byType = getHandle.getMapState[String, Long](
        "by_type", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(userId: Long, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[TypedLedger] = {
      var bal =
        if (balance.exists()) balance.get() else UserBalance(userId, 0L, 10.0)
      rows.foreach { e =>
        val delta = e.event_type match {
          case "purchase" => e.value
          case "error"    => -e.value
          case _          => 0.0
        }
        bal = UserBalance(userId, bal.n_events + 1, bal.coins + delta)
        val prev =
          if (byType.containsKey(e.event_type)) byType.getValue(e.event_type) else 0L
        byType.updateValue(e.event_type, prev + 1L)
      }
      balance.update(bal)
      def cnt(k: String): Long =
        if (byType.containsKey(k)) byType.getValue(k) else 0L
      Iterator.single(TypedLedger(
        userId, bal.n_events, bal.coins, cnt("purchase"), cnt("error")))
    }
  }

  /** The v2 ledger stream: requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`). */
  def typedLedger(events: Dataset[UserEvent]): Dataset[TypedLedger] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new LedgerProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** The batch→streaming MIGRATION path: the same ledger processor,
    * BOOTSTRAPPED from a batch-computed snapshot
    * (`StatefulProcessorWithInitialState` — the v2 API's answer to "we
    * already have months of history in the warehouse; start the stream
    * from there, don't replay it"). `handleInitialState` seeds each
    * key's ValueState before the first micro-batch; the spec proves
    * the algebra that makes the migration safe: batch history folded
    * to a snapshot + the tail streamed on top ≡ the whole log streamed
    * from scratch. The reference's own deployment story is exactly
    * this shape — a running MongoDB ledger that a stream processor
    * would have to adopt mid-life, not from genesis. */
  /** Output shape is UserBalance — the SNAPSHOT's own type — not
    * TypedLedger: the snapshot carries no per-event-type history, so
    * emitting "cumulative-looking" counters that actually counted only
    * the streamed tail would be a silently wrong migration (the review
    * finding). Balance in, balance maintained, balance out. */
  class LedgerProcessorWithInit
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, UserEvent, UserBalance, UserBalance] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var balance: ValueState[UserBalance] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      balance = getHandle.getValueState[UserBalance](
        "balance", Encoders.product[UserBalance], TTLConfig.NONE)
    override def handleInitialState(userId: Long, snapshot: UserBalance,
        timerValues: TimerValues): Unit =
      balance.update(snapshot)
    override def handleInputRows(userId: Long, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[UserBalance] = {
      var bal =
        if (balance.exists()) balance.get() else UserBalance(userId, 0L, 10.0)
      rows.foreach { e =>
        val delta = e.event_type match {
          case "purchase" => e.value
          case "error"    => -e.value
          case _          => 0.0
        }
        bal = UserBalance(userId, bal.n_events + 1, bal.coins + delta)
      }
      balance.update(bal)
      Iterator.single(bal)
    }
  }

  /** Ledger stream seeded from a batch snapshot: keys present in
    * `snapshot` continue from their history; unseen keys start fresh. */
  def typedLedgerFrom(events: Dataset[UserEvent],
                      snapshot: Dataset[UserBalance]): Dataset[UserBalance] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new LedgerProcessorWithInit,
        TimeMode.None(), OutputMode.Update(),
        snapshot.groupByKey(_.user_id))
  }

  final case class TtlCount(user_id: Long, n: Long, resumed: Boolean)

  /** State TTL — the v2 API's retention policy, attached PER STATE via
    * `TTLConfig` (v1 had only per-operator timeouts): a value untouched
    * for the configured duration is evicted by the store itself, and a
    * later read sees not-exists. This is how a 100 TB-of-stream ledger
    * bounds state for keys that go quiet (abandoned sessions, churned
    * users) without any explicit cleanup pass — RocksDB expires entries
    * on read/compaction, so the cost is amortized into normal
    * operation. TTL is processing-time by definition (retention is an
    * operational policy, not an event-time semantic), hence
    * TimeMode.ProcessingTime. StreamingSpec pins BOTH directions:
    * within-TTL accumulation resumes, past-TTL the key restarts
    * fresh. */
  class TtlCounterProcessor(ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, UserEvent, TtlCount] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var cnt: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofMillis(ttlMs)))
    override def handleInputRows(userId: Long, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[TtlCount] = {
      val resumed = cnt.exists()
      val n = (if (resumed) cnt.get() else 0L) + rows.size
      cnt.update(n)
      Iterator.single(TtlCount(userId, n, resumed))
    }
  }

  /** TTL-expiring per-user counter stream (RocksDB provider required,
    * like every transformWithState operator). */
  def ttlCounter(events: Dataset[UserEvent], ttlMs: Long): Dataset[TtlCount] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.groupByKey(_.user_id)
      .transformWithState(new TtlCounterProcessor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  final case class Transition(user_id: Long, prev_type: String, next_type: String)

  final case class TimedEvent(ts: java.sql.Timestamp, event_id: Long,
                              user_id: Long, event_type: String)

  final case class SessionAgg(first_us: Long, last_us: Long, n: Long)
  final case class SessionEmit(user_id: Long,
                               session_start: java.sql.Timestamp, n: Long)

  /** Timer-driven sessionization — the flagship use of the v2 API's
    * EVENT-TIME TIMERS: each user's OPEN sessions live in a ListState,
    * and a registered timer fires when the WATERMARK passes the
    * earliest (last event + gap), emitting every ripe session and
    * evicting it. This is `session_window` re-expressed imperatively —
    * the spec proves the two produce the IDENTICAL session set,
    * including under cross-batch OUT-OF-ORDER delivery — but the timer
    * form is the one that generalizes: emit-on-close side effects,
    * custom payloads, early heartbeats — shapes the declarative
    * aggregate can't express. Gap boundary is STRICT (< gap merges),
    * matching session_window's half-open [ts, ts+gap) end exactly.
    *
    * Why a LIST of open sessions: a session is definitively closed
    * only when the watermark passes last+gap — an apparent in-data gap
    * is NOT definitive, because a late-but-within-watermark event may
    * yet arrive inside it (extending a session's START backwards, or
    * BRIDGING two apparently-separate sessions into one — both cases
    * session_window handles and a single-ValueState form provably
    * got wrong, caught by review). So every batch merges the open set
    * with the new events by interval-union-with-gap-slack (the exact
    * transitive closure session_window computes), emits only
    * watermark-ripe clusters, and keeps the rest. State per key is
    * bounded by construction: open clusters all end within the
    * lateness horizon of the watermark, so |open| ≤ horizon/gap + 1
    * regardless of stream length. One timer per key (the earliest
    * close instant), CEILed to ms so it can never fire early against
    * microsecond event times. */
  class TimerSessionProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, TimedEvent, SessionEmit] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders
    @transient private var open: ListState[SessionAgg] = _
    private def gapUs: Long = gapMs * 1000L
    // java.sql.Timestamp.getTime is MILLISECOND-truncated; the fixture
    // carries microsecond timestamps, so both conversions go through
    // the nanos field or the emitted session_start loses 3 digits.
    private def toMicros(ts: java.sql.Timestamp): Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    private def toEmit(userId: Long, s: SessionAgg): SessionEmit = {
      val t = new java.sql.Timestamp(Math.floorDiv(s.first_us, 1000L))
      t.setNanos(((s.first_us % 1000000L) * 1000L).toInt)
      SessionEmit(userId, t, s.n)
    }
    /** Interval union with gap slack over sorted aggregates — the
      * transitive closure of "merge iff next.first − prev.last < gap". */
    private def merged(aggs: Seq[SessionAgg]): Seq[SessionAgg] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionAgg]
      aggs.sortBy(a => (a.first_us, a.last_us)).foreach { a =>
        if (out.nonEmpty && a.first_us - out.last.last_us < gapUs) {
          val c = out.remove(out.length - 1)
          out += SessionAgg(c.first_us, math.max(c.last_us, a.last_us), c.n + a.n)
        } else out += a
      }
      out.toSeq
    }
    /** Emit watermark-ripe clusters, keep the rest, keep ONE timer at
      * the earliest remaining close instant (CEILed to ms). */
    private def flush(userId: Long, clusters: Seq[SessionAgg],
        watermarkMs: Long): Iterator[SessionEmit] = {
      val wmUs = watermarkMs * 1000L
      val (ripe, rest) = clusters.partition(a => wmUs >= a.last_us + gapUs)
      if (rest.nonEmpty) open.put(rest.toArray) else open.clear()
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      if (rest.nonEmpty) {
        val nextUs = rest.map(_.last_us).min + gapUs
        getHandle.registerTimer(Math.floorDiv(nextUs + 999L, 1000L))
      }
      ripe.sortBy(_.first_us).map(toEmit(userId, _)).iterator
    }
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getListState[SessionAgg](
        "open", Encoders.product[SessionAgg], TTLConfig.NONE)
    override def handleInputRows(userId: Long, rows: Iterator[TimedEvent],
        timerValues: TimerValues): Iterator[SessionEmit] = {
      val incoming = rows.map { e =>
        val us = toMicros(e.ts); SessionAgg(us, us, 1L)
      }.toSeq
      val clusters = merged(open.get().toSeq ++ incoming)
      flush(userId, clusters, timerValues.getCurrentWatermarkInMs())
    }
    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionEmit] =
      flush(userId, open.get().toSeq, timerValues.getCurrentWatermarkInMs())
  }

  /** Event-time-timer sessionization stream (10-minute gap, e5's):
    * requires the RocksDB state store provider. */
  def timerSessions(events: Dataset[TimedEvent]): Dataset[SessionEmit] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new TimerSessionProcessor(600000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** e12's streaming twin — per-user event-type transitions as keyed
    * state: the state store holds each user's LAST event type; every
    * arrival emits one (prev, next) pair. Downstream, a plain streaming
    * groupBy over (prev_type, next_type) maintains the running
    * transition matrix in Update mode — the sequential-feature
    * extraction shape (n-gram-over-a-stream) a streaming corpus
    * pipeline uses for next-action models.
    *
    * Ordering: a micro-batch hands each group its rows in ARRIVAL order
    * — partition interleaving, not event time — so the rows are
    * buffered and sorted by (ts, event_id) before pairing; a
    * multi-partition or shuffled source within a batch still yields
    * event-time pairs (spec feeds exactly that). ACROSS batches the
    * source must deliver batches in event-time order (the watermark
    * discipline every upstream stage provides) — per-batch state is the
    * last event type only, matching the batch e12 window's ORDER BY
    * ts, event_id. Buffering is bounded by one key's rows in one
    * micro-batch, not the stream. */
  def transitionPairs(events: Dataset[TimedEvent]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[String, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[TimedEvent], state: GroupState[String]) =>
          var prev = state.getOption
          val out = Seq.newBuilder[Transition]
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            prev.foreach(p => out += Transition(userId, p, e.event_type))
            prev = Some(e.event_type)
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming exact dedup — the north-star dedup tier (d1/d2) in
    * streaming form: first event per (user_id, event_type) key wins,
    * duplicates arriving within the watermark horizon are dropped.
    * `dropDuplicatesWithinWatermark` expires each key's state once the
    * watermark passes its event time, so state is bounded by the
    * horizon × key cardinality — the property that lets this run
    * forever on an unbounded stream (a plain dropDuplicates would
    * accumulate state without bound). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("user_id", "event_type"))

  /** Stream-STREAM interval join: purchases matched to the same user's
    * clicks at most 5 minutes earlier. Both sides are watermarked and
    * the join condition bounds purchase_ts to [click_ts, click_ts+5m],
    * so each side's buffered state is evictable once the other side's
    * watermark passes the interval — the state-bounding contract
    * stream-stream joins require. (The batch as-of twin is e7.) */
  def clickToPurchaseJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("value").as("click_value"))
    val p = purchases
      .withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 5 MINUTES"))
      .select(col("user_id"), col("click_ts"), col("purchase_ts"),
        col("click_value"), col("purchase_value"))
  }

  /** The streaming-upsert sink pattern (`foreachBatch` MERGE): each
    * micro-batch is merged latest-per-key into a parquet snapshot —
    * rows whose `version` beats the snapshot's overwrite it, new keys
    * append, ties go to the incoming batch. This is how a stream
    * maintains a queryable CURRENT-STATE table (the reference's
    * users/tasks collections are exactly such snapshots; its writers
    * update them row-at-a-time — index.js:141-144,671-674).
    *
    * The merge is one ranking window over (snapshot ∪ batch), keyed by
    * the upsert key — state lives in the TABLE, not the stream, so
    * unlike mapGroupsWithState there is no per-key store to bound.
    * `localCheckpoint` materializes the merge before the overwrite so
    * the write never reads the files it replaces. At 100 TB the
    * snapshot rewrite must not be a full-table pass: a transactional
    * format (Iceberg/Delta MERGE INTO) or partition-scoped overwrite
    * replaces the overwrite below; the merge PLAN is identical. */
  def upsertBatch(snapshotPath: String, key: String, version: String)
                 (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val existing =
      try spark.read.parquet(snapshotPath)
      catch { case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
      }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
      .orderBy(col(version).desc, col("__is_new").desc)
    existing.withColumn("__is_new", lit(0))
      .unionByName(batch.withColumn("__is_new", lit(1)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", "__is_new")
      .localCheckpoint(true)
      .write.mode("overwrite").parquet(snapshotPath)
  }

  /** Convenience: run a streaming query over `df` into an in-memory
    * sink named `queryName`, process all available data, stop. Returns
    * the sink table. Used by tests and by batch-replay utilities. */
  def runToMemory(spark: SparkSession, df: DataFrame, queryName: String,
                  outputMode: OutputMode): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
