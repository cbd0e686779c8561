package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.Executors

import org.apache.spark.sql.SparkSession

/** Serving-throughput probe for the HTTP façade: requests/s per route
  * class, open vs auth-armed, serial and 8-way concurrent.
  *
  * What it quantifies (for SURVEY's serving table):
  *   - "/"              — pure server path, zero Spark work: the wire
  *                        ceiling of the JDK server + façade dispatch.
  *   - "/tasks/{id}"    — one key-pruned Spark point job per request:
  *                        the cost class of every point route (an OPEN
  *                        route in the reference, so probed open-only —
  *                        a token sent to it exercises no auth code).
  *   - "/payments" open vs ARMED on the SAME path and key: the armed
  *                        run adds exactly the FBToken HMAC verify plus
  *                        the route's own armed identity check (the
  *                        reference's email===decoded.email guard,
  *                        index.js:429-431, = one users point lookup).
  *                        This pair IS the cost of arming a route.
  *   - AdminReq route   — token + verifyAdmin's LIVE role point lookup
  *                        (the reference re-reads users per request,
  *                        kept verbatim).
  *
  * Usage: runMain graft.RestProbe <sfDir> [reqsPerRoute=200] [all|write]
  * Prints one JSON line per (route, mode, concurrency) with rps.
  *
  * `write` mode runs ONLY the write-path legs at depth 8 — the r11 #8
  * decade probe: the same mixed/same-entity bursts against stores built
  * over sf0.001/sf0.01/sf0.1 bases, with p50/p99 printed, so whether
  * the journal-fold compaction (runBody's amortized compact — whose
  * fold cost grows with the BASE each merged rewrite scans) holds the
  * tail as entity state grows is a table of measured rows, not an
  * extrapolation.
  */
object RestProbe {
  // One shared client (thread-safe): per-request client construction
  // would swamp the measurement with TLS-context setup.
  private lazy val client: HttpClient = HttpClient.newHttpClient()

  private def fire(base: String, path: String, tok: Option[String],
                   body: Option[String] = None): Int = {
    val b = HttpRequest.newBuilder(URI.create(base + path))
    body match {
      case Some(s) => b.POST(HttpRequest.BodyPublishers.ofString(s))
      case None    => b.GET()
    }
    tok.foreach(t => b.header("Authorization", s"Bearer $t"))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString()).statusCode()
  }

  private def run(label: String, base: String, path: String, tok: Option[String],
                  n: Int, threads: Int, body: Option[String] = None): Unit = {
    // Warm once (plan build + code paths), then measure.
    val warm = fire(base, path, tok, body)
    require(warm == 200, s"$label warmup -> $warm")
    val pool = Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    val futs = (1 to n).map(_ => pool.submit(new java.util.concurrent.Callable[Int] {
      def call(): Int = fire(base, path, tok, body)
    }))
    val codes = futs.map(_.get())
    val wall = (System.nanoTime() - t0) / 1e9
    pool.shutdown()
    require(codes.forall(_ == 200), s"$label saw non-200")
    println(f"""{"probe":"rest_rps","route":"$label","threads":$threads,"n":$n,"wall_s":$wall%.2f,"rps":${n / wall}%.0f}""")
  }

  /** Sustained-WRITE leg: N threads drive `n` POST /users registrations
    * (each = one email guard read + newId + an O(1) journal append,
    * +1 journal KEY per request — so the store's auto-compaction
    * threshold fires repeatedly MID-TRAFFIC, and its pause shows up
    * in-band as the tail latency instead of hiding between runs).
    * Reports rps plus p50/p99/max per-request latency; `expect` is the
    * route's success status (201). */
  private def runWrite(label: String, base: String, n: Int, threads: Int,
                       tag: String): Unit = {
    val warm = fire(base, "/users", None,
      Some(s"""{"name":"w","email":"warm-$tag-$threads@graft.io","role":"worker"}"""))
    require(warm == 201, s"$label warmup -> $warm")
    val lats = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val pool = Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    val futs = (1 to n).map(i => pool.submit(new java.util.concurrent.Callable[Int] {
      def call(): Int = {
        val r0 = System.nanoTime()
        val code = fire(base, "/users", None,
          Some(s"""{"name":"w$i","email":"w$i-$tag-$threads@graft.io","role":"worker"}"""))
        lats.add((System.nanoTime() - r0) / 1e3 / 1e3) // ms
        code
      }
    }))
    val codes = futs.map(_.get())
    val wall = (System.nanoTime() - t0) / 1e9
    pool.shutdown()
    require(codes.forall(_ == 201), s"$label saw non-201")
    val sorted = lats.toArray(Array.empty[java.lang.Double]).map(_.doubleValue()).sorted
    def pct(p: Double): Double = sorted(math.min(sorted.length - 1,
      (p * sorted.length).toInt))
    println(f"""{"probe":"rest_write_rps","route":"$label","threads":$threads,"n":$n,"wall_s":$wall%.2f,"rps":${n / wall}%.0f,"p50_ms":${pct(0.50)}%.1f,"p99_ms":${pct(0.99)}%.1f,"max_ms":${sorted.last}%.1f}""")
  }

  /** MIXED disjoint-entity write leg (r10 verdict #2's done criterion):
    * half the threads register users, half insert submissions — two
    * DISJOINT entity write sets. Under the old single store lock this
    * could not beat the single-entity ceiling (every body queued on one
    * writer); under per-entity locking the two populations only contend
    * within their own entity. Reported beside the single-entity rps so
    * the scaling past the ceiling is a printed number. */
  private def runMixed(label: String, base: String, n: Int, threads: Int,
                       tag: String): Unit = {
    val warm = fire(base, "/users", None,
      Some(s"""{"name":"m","email":"warm-mix-$tag-$threads@graft.io","role":"worker"}"""))
    require(warm == 201, s"$label warmup -> $warm")
    val lats = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val pool = Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    val futs = (1 to n).map(i => pool.submit(new java.util.concurrent.Callable[Int] {
      def call(): Int = {
        val r0 = System.nanoTime()
        val code =
          if (i % 2 == 0)
            fire(base, "/users", None,
              Some(s"""{"name":"m$i","email":"m$i-$tag-$threads@graft.io","role":"worker"}"""))
          else
            fire(base, "/submissions", None,
              Some(s"""{"task_id":1,"note":"mix-$tag-$i"}"""))
        lats.add((System.nanoTime() - r0) / 1e3 / 1e3) // ms
        code
      }
    }))
    val codes = futs.map(_.get())
    val wall = (System.nanoTime() - t0) / 1e9
    pool.shutdown()
    require(codes.forall(_ == 201), s"$label saw non-201")
    val sorted = lats.toArray(Array.empty[java.lang.Double]).map(_.doubleValue()).sorted
    def pct(p: Double): Double = sorted(math.min(sorted.length - 1,
      (p * sorted.length).toInt))
    println(f"""{"probe":"rest_write_mixed_rps","route":"$label","threads":$threads,"n":$n,"wall_s":$wall%.2f,"rps":${n / wall}%.0f,"p50_ms":${pct(0.50)}%.1f,"p99_ms":${pct(0.99)}%.1f,"max_ms":${sorted.last}%.1f}""")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args.lift(1).map(_.toInt).getOrElse(200)
    val mode = args.lift(2).getOrElse("all")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val secret = "rest-probe-secret"
    // Read/ann facades only exist in "all" mode — the write decade
    // probe must not pay their index builds and warmups.
    val readSetup = if (mode != "all") None else Some {
      val (openSrv, _) = RestServe.startWithStore(spark, sfDir, 0)
      val (armedSrv, _) = RestServe.startWithStore(spark, sfDir, 0, authSecret = Some(secret))
      val openBase = s"http://127.0.0.1:${openSrv.getAddress.getPort}"
      val armedBase = s"http://127.0.0.1:${armedSrv.getAddress.getPort}"

      // An admin identity for the role-gated route (journal write, O(1);
      // the armed server holds its own store — register there, checked).
      val admin = "probe-admin@graft.io"
      val reg = HttpRequest.newBuilder(URI.create(armedBase + "/users")).POST(
        HttpRequest.BodyPublishers.ofString(
          s"""{"name":"Probe","email":"$admin","role":"admin"}"""))
      val regCode = client.send(reg.build(), HttpResponse.BodyHandlers.ofString()).statusCode()
      require(regCode == 201, s"probe admin registration -> $regCode")
      val adminTok = GraftAuth.token(secret, admin)
      // The payments pair rides a FIXTURE identity: custkey 1's c_name IS
      // the email stand-in, so the armed identity check matches ?user=1
      // with no setup writes.
      val cust1Tok = GraftAuth.token(secret, "Customer#000000001")

      // The vector-search extension: one topK Spark job per request over
      // the LIVING index (history + one ingested stream batch), through
      // the bucket-pruned serving path — the cost class of a per-request
      // analytics job with a payload-bounded scan.
      val annState = Scratch.tempDir("restprobe_ann") + "/state"
      import spark.implicits._
      graft.streaming.StreamingAnnIngest.processBatch(sfDir, annState)(
        Tables(spark, sfDir).embeddings.filter($"vec_id" % 2 === 1)
          .localCheckpoint(true), 0L)
      val (annSrv, _) = RestServe.startWithStore(spark, sfDir, 0,
        annStatePath = Some(annState))
      val annBase = s"http://127.0.0.1:${annSrv.getAddress.getPort}"
      val annBody = Tables(spark, sfDir).embeddings.filter($"vec_id" === 3)
        .select($"embedding").as[Seq[Float]].head()
        .mkString("""{"embedding":[""", ",", """],"k":10}""")
      (openSrv, armedSrv, annSrv, openBase, armedBase, annBase,
        adminTok, cust1Tok, annBody)
    }

    // WRITE-load facades: autoCompactAt = 64 so the LSM fold fires
    // every 64 new journal keys — repeatedly inside the measured
    // window — and one twin runs the DURABLE posture (per-request
    // fsynced WAL) so the price of durability is a measured number,
    // not a guess.
    val (writeSrv, _) = RestServe.startWithStore(spark, sfDir, 0,
      autoCompactAt = 64)
    // walCheckpointEvery = 128: the WAL facade also snapshots+rotates
    // mid-traffic, so the checkpoint pause lands in the measured tail
    // exactly like the compaction pause does.
    val (walSrv, walStore) = RestServe.startWithStore(spark, sfDir, 0,
      autoCompactAt = 64,
      walPath = Some(Scratch.tempDir("restprobe_wal") + "/ops.wal"),
      walCheckpointEvery = 128)
    val writeBase = s"http://127.0.0.1:${writeSrv.getAddress.getPort}"
    val walBase = s"http://127.0.0.1:${walSrv.getAddress.getPort}"

    val threadsList = if (mode == "write") Seq(8) else Seq(1, 8)
    for (threads <- threadsList) {
      readSetup.foreach { case (_, _, _, openBase, armedBase, annBase,
          adminTok, cust1Tok, annBody) =>
        run("health(open)", openBase, "/", None, n, threads)
        run("dashboard_memo(open)", openBase, "/top-workers", None, n, threads)
        run("tasks_point(open)", openBase, "/tasks/1", None, n, threads)
        run("payments(open)", openBase, "/payments?user=1&limit=5", None, n, threads)
        run("payments(armed+token)", armedBase, "/payments?user=1&limit=5", Some(cust1Tok), n, threads)
        run("admin_users_adminreq(armed)", armedBase, "/admin/users", Some(adminTok), n, threads)
        run("ann_query(open)", annBase, "/ann/query", None, n, threads, Some(annBody))
      }
      runWrite("users_post(write)", writeBase, n, threads, "plain")
      runWrite("users_post(write+wal)", walBase, n, threads, "wal")
      runMixed("users+submissions(write)", writeBase, n, threads, s"p$threads")
      runMixed("users+submissions(write+wal)", walBase, n, threads, s"w$threads")
    }
    // LOCK-SCALING leg: a facade whose auto-compaction cannot fire
    // inside the window (threshold >> request count), so the numbers
    // isolate dispatch + entity locks + journal appends from the LSM
    // fold pauses that dominate the legs above. Same-entity vs
    // disjoint-entity at depth 8 is the per-entity-locking readout.
    val (lockSrv, _) = RestServe.startWithStore(spark, sfDir, 0,
      autoCompactAt = 100000)
    val lockBase = s"http://127.0.0.1:${lockSrv.getAddress.getPort}"
    runWrite("users_post(nocompact)", lockBase, 400, 8, "lk")
    runMixed("users+submissions(nocompact)", lockBase, 400, 8, "lk8")
    lockSrv.stop(0)
    // Group-commit accounting for the WAL facade's whole run: with 8
    // threads the fsync count must sit below the commit count (each
    // coalesced fsync covered several acknowledged bodies).
    for (w <- walStore.wal)
      println(s"""{"probe":"wal_group_commit","commits":${w.commits.get()},"syncs":${w.syncs.get()}}""")
    // Incremental-checkpoint pause (r10 verdict #1): after a users-only
    // write burst, a checkpoint snapshots users (+whatever traffic
    // dirtied); a SECOND burst touching ONLY submissions then
    // checkpoints submissions alone — the pause tracks the CHANGED
    // entity, not every entity ever touched.
    for (_ <- walStore.wal) {
      def timed(label: String)(body: => Unit): Unit = {
        val t0 = System.nanoTime()
        body
        println(f"""{"probe":"wal_checkpoint_pause","leg":"$label","wall_s":${(System.nanoTime() - t0) / 1e9}%.3f}""")
      }
      timed("after_mixed_traffic")(walStore.checkpoint())
      (1 to 50).foreach(i => walStore.mutateOn(Seq("submissions")) {
        walStore.submissions.upsert(Map(
          "l_orderkey" -> 1L, "l_linenumber" -> (90000 + i),
          "l_partkey" -> 1L, "l_suppkey" -> 1L, "note" -> s"ckpt-$i"))
      })
      timed("submissions_only")(walStore.checkpoint())
    }
    readSetup.foreach { case (openSrv, armedSrv, annSrv, _, _, _, _, _, _) =>
      openSrv.stop(0); armedSrv.stop(0); annSrv.stop(0)
    }
    writeSrv.stop(0); walSrv.stop(0)
    spark.stop()
  }
}
