package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The store's own contracts, driven directly (no HTTP): the bounded
  * secondary-key read, and the write-ahead log — replay equivalence,
  * newId safety across restart, torn-tail tolerance vs mid-file
  * corruption, and the real thing: a SIGKILLed façade whose
  * acknowledged HTTP writes survive into a fresh process. */
class StateStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def rowsOf(e: EntityState): Seq[String] =
    e.current().collect().map(_.toString).sorted.toSeq

  // ---- lookupBy: bounded, deterministic, supersede-aware -------------

  test("lookupBy on a NON-unique secondary column: smallest primary key wins, supersede hides rewritten base rows, journal wins last-write") {
    import spark.implicits._
    val store = new StateStore(spark, dir)
    // o_orderstatus is massively non-unique — the exact shape whose
    // every base match the old form collected onto the driver. The
    // read itself is limit(1) now; semantics pinned here.
    val expectedFirst = Tables(spark, dir).orders
      .filter($"o_orderstatus" === "O")
      .agg(min($"o_orderkey")).as[Long].head()
    val hit = store.tasks.lookupBy("o_orderstatus", "O")
    assert(hit.exists(_("o_orderkey") == expectedFirst),
      s"smallest-key determinism: $hit")

    // Supersede: journal the winner AWAY from status O — the base copy
    // of that key must be hidden and the next-smallest O row win.
    assert(store.tasks.patch(Seq(expectedFirst), Map("o_orderstatus" -> "X")))
    val second = Tables(spark, dir).orders
      .filter($"o_orderstatus" === "O" && $"o_orderkey" =!= expectedFirst)
      .agg(min($"o_orderkey")).as[Long].head()
    assert(store.tasks.lookupBy("o_orderstatus", "O")
      .exists(_("o_orderkey") == second))

    // Journal-first, last write wins: two journaled O rows — the later
    // one is returned regardless of key order.
    store.tasks.upsert(Map("o_orderkey" -> 900001L, "o_orderstatus" -> "O"))
    store.tasks.upsert(Map("o_orderkey" -> 900002L, "o_orderstatus" -> "O"))
    assert(store.tasks.lookupBy("o_orderstatus", "O")
      .exists(_("o_orderkey") == 900002L))

    // Tombstoned base row is hidden from the secondary read too.
    val uniq = store.users.lookupBy("c_name", "Customer#000000001")
    assert(uniq.isDefined)
    assert(store.users.delete(Seq(uniq.get("c_custkey"))))
    assert(store.users.lookupBy("c_name", "Customer#000000001").isEmpty)
  }

  test("lookupBy Bloom fast path: a provably-absent secondary value answers with ZERO Spark jobs; positives and compaction stay correct") {
    val store = new StateStore(spark, dir)
    // Warm-up: builds the per-column sketch (jobs expected here).
    assert(store.users.lookupBy("c_name", "nobody-1@graft.io").isEmpty)
    // The fast path, measured by the engine's own accounting: jobs our
    // thread triggers carry this job group — an absent value after the
    // sketch exists must enqueue NONE.
    val sc = spark.sparkContext
    sc.setJobGroup("bloom-fast-path", "StateStoreSpec bloom probe")
    try {
      assert(store.users.lookupBy("c_name", "nobody-2@graft.io").isEmpty)
      Thread.sleep(1500) // status store feeds from the async listener bus
      val jobs = sc.statusTracker.getJobIdsForGroup("bloom-fast-path")
      assert(jobs.isEmpty,
        s"absent-value guard must not run a Spark job, ran ${jobs.length}")
    } finally sc.clearJobGroup()
    // A present value rides the sketch's positive into the real probe.
    assert(store.users.lookupBy("c_name", "Customer#000000002").isDefined)
    // Compaction folds journal rows into the base AND into the live
    // sketches (no rebuild job): the folded row must stay visible, and
    // absent values must stay provably absent.
    store.users.upsert(Map("c_custkey" -> 777777L, "c_name" -> "folded@graft.io"))
    store.users.compact()
    assert(store.users.lookupBy("c_name", "folded@graft.io").isDefined,
      "a folded journal row must stay visible through the folded sketch")
    assert(store.users.lookupBy("c_name", "nobody-3@graft.io").isEmpty)
  }

  // ---- WAL: replay equivalence --------------------------------------

  test("WAL replay rebuilds the journal exactly: every op kind, every value type, across entities") {
    val wal = Scratch.tempDir("wal_spec") + "/ops.wal"
    val a = new StateStore(spark, dir, walPath = Some(wal))
    // Every coerce-producible type rides a row: long/int keys, double,
    // string, boolean + null + timestamp as EVOLVED columns.
    val id = a.users.newId()
    a.users.upsert(Map("c_custkey" -> id, "c_name" -> "wal@graft.io",
      "c_nationkey" -> 7, "c_acctbal" -> 12.5, "c_mktsegment" -> "BUILDING",
      "verified" -> true, "note" -> null, "joined" -> a.now()))
    assert(a.users.patch(Seq(id), Map("c_acctbal" -> 99.25)))
    assert(a.tasks.patch(Seq(7L), Map("o_orderstatus" -> "approved")))
    assert(a.tasks.delete(Seq(11L)))
    a.submissions.upsert(Map("l_orderkey" -> 1L, "l_linenumber" -> 1,
      "l_partkey" -> 155190L, "l_suppkey" -> 7706L, "status" -> "approved"))
    a.notifications.delete(Seq(5L))

    val b = new StateStore(spark, dir, walPath = Some(wal))
    for ((ea, eb) <- Seq(a.users -> b.users, a.tasks -> b.tasks,
        a.submissions -> b.submissions, a.notifications -> b.notifications)) {
      assert(ea.journalSize == eb.journalSize)
      assert(rowsOf(ea) == rowsOf(eb), "replayed merged state must be identical")
    }
    // Typed round-trip, point-read form.
    val u = b.users.lookup(Seq(id)).get
    assert(u("c_acctbal") == 99.25 && u("verified") == true
      && u("note") == null && u("joined").isInstanceOf[java.sql.Timestamp])
    // newId never re-hands-out a replayed id; the logical clock resumes
    // monotone past replayed stamps.
    assert(b.users.newId() > id)
    assert(b.now().after(u("joined").asInstanceOf[java.sql.Timestamp]))
  }

  test("WAL torn tail is dropped (unacknowledged); mid-file corruption refuses to boot") {
    val wal = Scratch.tempDir("wal_torn") + "/ops.wal"
    val a = new StateStore(spark, dir, walPath = Some(wal))
    a.tasks.patch(Seq(7L), Map("o_orderstatus" -> "approved")): Unit
    // A crash mid-append: partial JSON, no trailing newline.
    Files.write(Paths.get(wal), """{"e":"tasks","del":false,"tk":9,"key":[{"t":"l","v"""".getBytes,
      StandardOpenOption.APPEND)
    val b = new StateStore(spark, dir, walPath = Some(wal))
    assert(b.tasks.journalSize == 1 &&
      b.tasks.lookup(Seq(7L)).exists(_("o_orderstatus") == "approved"))

    // Corruption BEFORE acknowledged records must throw, not silently
    // drop acknowledged writes.
    val wal2 = Scratch.tempDir("wal_corrupt") + "/ops.wal"
    val c = new StateStore(spark, dir, walPath = Some(wal2))
    c.tasks.patch(Seq(7L), Map("o_orderstatus" -> "approved")): Unit
    val good = new String(Files.readAllBytes(Paths.get(wal2)))
    Files.write(Paths.get(wal2), ("garbage not json\n" + good).getBytes)
    assertThrows[IllegalStateException] {
      new StateStore(spark, dir, walPath = Some(wal2))
    }
  }

  test("auto-compaction does not lose WAL'd history: replay after a fold reproduces the merged state") {
    import spark.implicits._
    val wal = Scratch.tempDir("wal_compact") + "/ops.wal"
    val a = new StateStore(spark, dir, autoCompactAt = 4, walPath = Some(wal))
    // 6 upserts under mutate(): the 5th crosses the threshold and folds
    // the journal into a scratch base — which a NEW PROCESS cannot see.
    (1 to 6).foreach { i =>
      a.mutate(a.notifications.upsert(Map("event_id" -> (800000L + i),
        "event_type" -> "notification", "message" -> s"m$i")))
    }
    assert(a.notifications.journalSize <= 4, "threshold must have folded")
    val b = new StateStore(spark, dir, autoCompactAt = 4, walPath = Some(wal))
    val names = b.notifications.current()
      .filter($"event_id" >= 800001L && $"event_id" <= 800006L)
      .select($"message").as[String].collect().sorted.toSeq
    assert(names == (1 to 6).map(i => s"m$i"),
      s"all six acknowledged writes must survive the fold + restart: $names")
  }

  test("WAL checkpoint: snapshot + rotation bound recovery to ops-since-checkpoint; crash windows replay correctly; auto-trigger fires") {
    import java.nio.file.{Files, Paths}
    val root = Scratch.tempDir("wal_ckpt")
    val wal = root + "/ops.wal"
    def walLines(): Int = Files.readAllLines(Paths.get(wal)).size()

    val a = new StateStore(spark, dir, walPath = Some(wal))
    assert(a.tasks.patch(Seq(7L), Map("o_orderstatus" -> "approved")))
    a.users.upsert(Map("c_custkey" -> 700001L, "c_name" -> "ck@graft.io"))
    val preRotation = Files.readAllBytes(Paths.get(wal))
    a.checkpoint()
    assert(walLines() == 0, "a committed checkpoint must rotate the log")
    // Post-checkpoint ops: the log carries ONLY these.
    assert(a.notifications.delete(Seq(5L)))
    assert(a.tasks.patch(Seq(11L), Map("o_orderstatus" -> "approved")))
    assert(walLines() == 2, "recovery cost must be ops-SINCE-checkpoint")

    // Clean recovery: snapshot base + short log = the full state.
    val b = new StateStore(spark, dir, walPath = Some(wal))
    for ((ea, eb) <- Seq(a.tasks -> b.tasks, a.users -> b.users,
        a.notifications -> b.notifications))
      assert(rowsOf(ea) == rowsOf(eb),
        "checkpoint + tail replay must equal the live store")
    assert(b.users.newId() > 700001L,
      "the id watermark must survive through the snapshot")

    // Crash window: manifest committed but the rotation never ran —
    // the full pre-checkpoint log sits in FRONT of the tail. Replaying
    // already-folded ops onto the snapshot must be idempotent.
    val post = Files.readAllBytes(Paths.get(wal))
    Files.write(Paths.get(wal), preRotation ++ post)
    val c = new StateStore(spark, dir, walPath = Some(wal))
    for ((ea, ec) <- Seq(a.tasks -> c.tasks, a.users -> c.users,
        a.notifications -> c.notifications))
      assert(rowsOf(ea) == rowsOf(ec),
        "replay of pre-checkpoint ops onto the snapshot must be idempotent")

    // Crash window: a snapshot version without a manifest is a crash
    // remnant — recovery must ignore it and use the committed one.
    Files.createDirectories(Paths.get(s"$root/snap/v99/users"))
    Files.write(Paths.get(s"$root/snap/v99/users/part-junk"), "junk".getBytes)
    Files.write(Paths.get(wal), post) // back to the clean tail
    val d = new StateStore(spark, dir, walPath = Some(wal))
    assert(rowsOf(d.tasks) == rowsOf(a.tasks),
      "a manifest-less snapshot remnant must be invisible to recovery")

    // Auto-trigger: crossing walCheckpointEvery inside mutate()
    // checkpoints without anyone calling it.
    val root2 = Scratch.tempDir("wal_auto")
    val e = new StateStore(spark, dir, walPath = Some(root2 + "/ops.wal"),
      walCheckpointEvery = 5)
    (1 to 6).foreach(i => e.mutate(
      e.notifications.upsert(Map("event_id" -> (810000L + i),
        "event_type" -> "notification"))))
    assert(StateStore.latestSnapshot(root2).isDefined,
      "the op-count threshold must fire a checkpoint on its own")
    assert(Files.readAllLines(Paths.get(root2 + "/ops.wal")).size() < 6)
    val f = new StateStore(spark, dir, walPath = Some(root2 + "/ops.wal"))
    assert(rowsOf(f.notifications) == rowsOf(e.notifications))
  }

  // ---- incremental checkpoints (r10 verdict #1) -----------------------

  test("incremental checkpoint: an untouched entity is pointed at, not rewritten; the reaper never deletes a still-referenced version") {
    import java.nio.file.{Files, Paths}
    val root = Scratch.tempDir("wal_incr")
    val wal = root + "/ops.wal"
    val a = new StateStore(spark, dir, walPath = Some(wal))
    // Checkpoint 1: users + tasks dirty.
    a.users.upsert(Map("c_custkey" -> 710001L, "c_name" -> "incr@graft.io"))
    assert(a.tasks.patch(Seq(7L), Map("o_orderstatus" -> "approved")))
    a.checkpoint()
    val (v1, ptrs1, _) = StateStore.latestSnapshot(root).get
    assert(ptrs1 == Map("users" -> v1, "tasks" -> v1), s"first manifest: $ptrs1")
    // Checkpoint 2: ONLY notifications dirty — users/tasks must keep
    // their v1 pointers and their v1 bytes must NOT be rewritten.
    assert(a.notifications.delete(Seq(5L)))
    val usersSnapMtime = Files.getLastModifiedTime(
      Paths.get(s"$root/snap/v$v1/users")).toMillis
    a.checkpoint()
    val (v2, ptrs2, _) = StateStore.latestSnapshot(root).get
    assert(v2 == v1 + 1)
    assert(ptrs2 == Map("users" -> v1, "tasks" -> v1, "notifications" -> v2),
      s"the untouched entities must be re-REFERENCED, not re-written: $ptrs2")
    assert(Files.exists(Paths.get(s"$root/snap/v$v1/users")),
      "the reaper must never delete a still-referenced version")
    assert(Files.getLastModifiedTime(Paths.get(s"$root/snap/v$v1/users"))
      .toMillis == usersSnapMtime, "an untouched entity's snapshot was rewritten")
    assert(!Files.exists(Paths.get(s"$root/snap/v$v2/users")),
      "checkpoint 2 must snapshot ONLY the dirty entity")
    // A third checkpoint with a users touch moves its pointer and the
    // reaper may now drop nothing referenced by the two newest
    // manifests (v2's pointers still include v1's users/tasks).
    a.users.upsert(Map("c_custkey" -> 710002L, "c_name" -> "incr2@graft.io"))
    a.checkpoint()
    val (v3, ptrs3, _) = StateStore.latestSnapshot(root).get
    assert(ptrs3("users") == v3 && ptrs3("tasks") == v1)
    assert(Files.exists(Paths.get(s"$root/snap/v$v1/tasks")),
      "tasks@v1 is referenced by the LATEST manifest — must survive any reap")
    // Recovery through the pointers: exact state.
    val b = new StateStore(spark, dir, walPath = Some(wal))
    for ((ea, eb) <- Seq(a.users -> b.users, a.tasks -> b.tasks,
        a.notifications -> b.notifications))
      assert(rowsOf(ea) == rowsOf(eb),
        "recovery through entity->version pointers must be exact")
  }

  // ---- WAL batch framing + rollback (r10 ADVICE mediums) --------------

  test("a multi-op mutate() body is ONE atomic WAL record: a torn tail drops the whole body, never half an invariant") {
    import java.nio.file.{Files, Paths}
    val wal = Scratch.tempDir("wal_batch") + "/ops.wal"
    val a = new StateStore(spark, dir, walPath = Some(wal))
    // The approve shape: a submission $set + a user $inc in one body.
    a.mutateOn(Seq("submissions", "users")) {
      a.submissions.upsert(Map("l_orderkey" -> 1L, "l_linenumber" -> 1,
        "l_partkey" -> 155190L, "l_suppkey" -> 7706L, "status" -> "approved"))
      assert(a.users.patch(Seq(1L), Map("c_acctbal" -> 999.75)))
    }
    val lines = Files.readAllLines(Paths.get(wal))
    assert(lines.size() == 1, s"one body must frame as ONE record, got ${lines.size()}")
    assert(lines.get(0).contains("\"b\""), "multi-op bodies use the batch frame")
    // Replay of the intact record applies BOTH ops.
    val b = new StateStore(spark, dir, walPath = Some(wal))
    assert(b.users.lookup(Seq(1L)).exists(_("c_acctbal") == 999.75))
    assert(b.submissions.lookup(Seq(1L, 1, 155190L, 7706L))
      .exists(_("status") == "approved"))
    // Tear the record (crash mid-append): BOTH ops vanish — the store
    // can never recover half the invariant.
    val full = new String(Files.readAllBytes(Paths.get(wal)))
    Files.write(Paths.get(wal), full.dropRight(30).getBytes)
    val c = new StateStore(spark, dir, walPath = Some(wal))
    assert(c.users.journalSize == 0 && c.submissions.journalSize == 0,
      "a torn batch record must drop the WHOLE body on replay")
  }

  test("a failed WAL append rolls the body's journal ops back: served state never diverges from durable state") {
    val wal = Scratch.tempDir("wal_fail") + "/ops.wal"
    val a = new StateStore(spark, dir, walPath = Some(wal))
    a.users.upsert(Map("c_custkey" -> 720001L, "c_name" -> "pre@graft.io"))
    // Force the next append to fail: close the log's stream out from
    // under the store (the disk-full / IO-error stand-in).
    a.wal.get.close()
    val thrown = intercept[Exception] {
      a.mutateOn(Seq("users", "tasks")) {
        a.users.upsert(Map("c_custkey" -> 720002L, "c_name" -> "lost@graft.io"))
        a.tasks.patch(Seq(7L), Map("o_orderstatus" -> "half")): Unit
      }
    }
    assert(thrown.isInstanceOf[java.io.IOException], s"unexpected: $thrown")
    // The failed body's ops are GONE from served state...
    assert(a.users.lookup(Seq(720002L)).isEmpty,
      "an un-logged write must not stay live in memory")
    assert(!a.tasks.lookup(Seq(7L)).exists(_("o_orderstatus") == "half"))
    // ...and the pre-failure write (which WAS logged) replays fine.
    val b = new StateStore(spark, dir, walPath = Some(wal))
    assert(b.users.lookup(Seq(720001L)).isDefined)
    assert(b.users.lookup(Seq(720002L)).isEmpty)
  }

  // ---- checkpoint failure atomicity (r11 ADVICE medium #1) ------------

  test("a FAILED checkpoint leaves every entity dirty and commits nothing; the retry uses a fresh version and loses no acknowledged write") {
    val root = Scratch.tempDir("wal_ckpt_fail")
    val wal = root + "/ops.wal"
    val a = new StateStore(spark, dir, walPath = Some(wal))
    a.users.upsert(Map("c_custkey" -> 740001L, "c_name" -> "ckfail@graft.io"))
    assert(a.tasks.patch(Seq(7L), Map("o_orderstatus" -> "approved")))
    // Fail the manifest commit AFTER the compactTo loop has already
    // snapshotted (and re-based) the dirty entities — the exact window
    // where the old per-entity dirty-clearing lost acknowledged writes.
    StateStore.manifestFault =
      () => throw new java.io.IOException("injected manifest failure")
    try intercept[java.io.IOException] { a.checkpoint() }
    finally StateStore.manifestFault = () => ()
    // Nothing committed: no manifest, WAL unrotated — recovery from the
    // old base + full log is complete.
    assert(StateStore.latestSnapshot(root).isEmpty,
      "a failed checkpoint must not commit a manifest")
    assert(Files.readAllLines(Paths.get(wal)).size() == 2,
      "a failed checkpoint must not rotate the WAL")
    val b = new StateStore(spark, dir, walPath = Some(wal))
    assert(rowsOf(b.users) == rowsOf(a.users) && rowsOf(b.tasks) == rowsOf(a.tasks),
      "recovery across a failed checkpoint must see every acknowledged write")
    // Retry: a FRESH version commits — the failed attempt's v0 dirs
    // (which the live bases now read) are never overwritten — and both
    // entities re-snapshot (still dirty).
    a.checkpoint()
    val (v, ptrs, _) = StateStore.latestSnapshot(root).get
    assert(v == 1L, s"the retry must write a fresh version, got v$v")
    assert(ptrs == Map("users" -> 1L, "tasks" -> 1L), s"retry pointers: $ptrs")
    assert(Files.readAllLines(Paths.get(wal)).isEmpty,
      "the successful retry rotates the log")
    val c = new StateStore(spark, dir, walPath = Some(wal))
    assert(rowsOf(c.users) == rowsOf(a.users) && rowsOf(c.tasks) == rowsOf(a.tasks),
      "recovery through the retried checkpoint must be exact")
  }

  // ---- WAL partial-append truncation (r11 ADVICE medium #2) -----------

  test("a PARTIAL WAL append leaves no bytes behind: the op rolls back, the log stays replayable, later commits append cleanly") {
    val walPath = Scratch.tempDir("wal_partial") + "/ops.wal"
    val a = new StateStore(spark, dir, walPath = Some(walPath))
    a.users.upsert(Map("c_custkey" -> 750001L, "c_name" -> "ok@graft.io"))
    val lenBefore = new java.io.File(walPath).length()
    // Inject ONE mid-buffer failure (the ENOSPC shape): half the record's
    // bytes land, then the write throws.
    a.wal.get.out = new java.io.FileOutputStream(new java.io.File(walPath), true) {
      private var armed = true
      override def write(b: Array[Byte]): Unit =
        if (armed) { armed = false; super.write(b, 0, b.length / 2)
          throw new java.io.IOException("injected mid-buffer failure") }
        else super.write(b)
    }
    intercept[java.io.IOException] {
      a.users.upsert(Map("c_custkey" -> 750002L, "c_name" -> "torn@graft.io"))
    }
    assert(new java.io.File(walPath).length() == lenBefore,
      "the failed append's partial bytes must be truncated away")
    assert(a.users.lookup(Seq(750002L)).isEmpty,
      "the failed op must roll back from served state")
    // Without the truncation this next record would append AFTER the
    // torn bytes — mid-file corruption that refuses every later boot.
    a.users.upsert(Map("c_custkey" -> 750003L, "c_name" -> "after@graft.io"))
    val b = new StateStore(spark, dir, walPath = Some(walPath))
    assert(b.users.lookup(Seq(750001L)).isDefined)
    assert(b.users.lookup(Seq(750002L)).isEmpty)
    assert(b.users.lookup(Seq(750003L)).isDefined,
      "commits after a truncated failure must replay cleanly")
  }

  // ---- direct writes vs checkpoints (r11 ADVICE low) ------------------

  test("direct EntityState writes serialize with concurrent checkpoints: every acknowledged op survives recovery") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val wal = Scratch.tempDir("wal_direct_race") + "/ops.wal"
    val a = new StateStore(spark, dir, walPath = Some(wal))
    val n = 48
    val writer = Future {
      (1 to n).foreach(i => a.notifications.upsert(Map(
        "event_id" -> (840000L + i), "event_type" -> "notification")))
    }
    // Checkpoints race the direct writer: before the fence, a commit
    // could land its record in a log rotate() was deleting.
    val ckpts = Future { (1 to 6).foreach { _ => a.checkpoint(); Thread.sleep(10) } }
    Await.result(Future.sequence(Seq(writer, ckpts)), 300.seconds)
    val b = new StateStore(spark, dir, walPath = Some(wal))
    import spark.implicits._
    val got = b.notifications.current()
      .filter(col("event_id").between(840001L, 840000L + n))
      .select(col("event_id")).as[Long].collect().sorted.toSeq
    assert(got == (1 to n).map(840000L + _),
      s"every directly-acknowledged op must survive: got ${got.length} of $n")
  }

  // ---- group commit + per-entity concurrency (r10 verdict #2/#8) ------

  test("group commit: 8 concurrent writers fsync FEWER times than they commit; disjoint-entity bodies do not serialize on one store lock") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    // Coalescing is RATE-dependent (the r11 survey's own observation:
    // when every fsync completes before the next commit arrives, syncs
    // legitimately equal commits — the fast-disk/quiet-box case, first
    // observed as a 320-of-320 flake in an otherwise green r12 run).
    // The property under test is that coalescing CAN engage under
    // queue pressure, so the load round retries a bounded number of
    // times and passes when ANY round coalesces; the no-lost-write
    // assertions below still run on every round unconditionally.
    val perThread = 40
    var coalesced = false
    var round = 0
    while (!coalesced && round < 4) {
      round += 1
      val wal = Scratch.tempDir(s"wal_group$round") + "/ops.wal"
      val a = new StateStore(spark, dir, walPath = Some(wal))
      val work = (0 until 8).map { t =>
        Future {
          val entity = if (t % 2 == 0) "users" else "notifications"
          (1 to perThread).foreach { i =>
            a.mutateOn(Seq(entity)) {
              if (t % 2 == 0)
                a.users.upsert(Map("c_custkey" -> (730000L + t * 1000 + i),
                  "c_name" -> s"g$t-$i@graft.io"))
              else
                a.notifications.upsert(Map("event_id" -> (830000L + t * 1000 + i),
                  "event_type" -> "notification"))
            }
          }
        }
      }
      Await.result(Future.sequence(work), 180.seconds)
      val w = a.wal.get
      assert(w.commits.get() == 8L * perThread, s"commits: ${w.commits.get()}")
      assert(w.syncs.get() <= w.commits.get(),
        s"syncs can never exceed commits: ${w.syncs.get()} vs ${w.commits.get()}")
      coalesced = w.syncs.get() < w.commits.get()
      // Nothing lost: every op replays — on EVERY round, coalesced or not.
      val b = new StateStore(spark, dir, walPath = Some(wal))
      assert(b.users.journalSize == 4 * perThread)
      assert(b.notifications.journalSize == 4 * perThread)
    }
    assert(coalesced,
      s"group commit never coalesced across $round rounds of 8-writer load " +
        "(every fsync won the race every time — on this box that is a real regression)")
  }

  // ---- the real thing: SIGKILL the serving process --------------------

  test("acknowledged HTTP writes survive a SIGKILLed facade: WAL replay in a fresh store") {
    val wal = Scratch.tempDir("wal_kill") + "/ops.wal"
    val proc = new ProcessBuilder(
      ChildJvm.command("graft.WalCrashServe", Seq(dir, wal)): _*)
      .redirectErrorStream(true).start()
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var port = -1
    val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
    while (port < 0 && System.nanoTime() < deadline) {
      val l = reader.readLine()
      if (l == null) Thread.sleep(50)
      else if (l.startsWith("WAL_READY")) port = l.split("port=")(1).trim.toInt
    }
    assert(port > 0, "child facade never came up")
    try {
      val http = new RestHttp {
        override val base = s"http://127.0.0.1:$port"
      }
      assert(http.post("/users",
        """{"name":"K","email":"kill@graft.io","role":"admin"}""")._1 == 201)
      assert(http.patch("/admin/users/kill@graft.io/role",
        """{"role":"worker"}""")._1 == 200)
      // Both responses are in hand — the writes are ACKNOWLEDGED. Kill
      // without ceremony: no shutdown hooks, no flushes beyond what
      // append() already fsynced.
      proc.destroyForcibly()
      proc.waitFor()
    } finally if (proc.isAlive) { proc.destroyForcibly(); proc.waitFor(): Unit }

    val revived = new StateStore(spark, dir, walPath = Some(wal))
    val u = revived.users.lookupBy("c_name", "kill@graft.io")
    assert(u.isDefined, "the acknowledged registration must survive the kill")
    assert(u.get("role") == "worker",
      s"the acknowledged role patch must survive too: $u")
  }
}
