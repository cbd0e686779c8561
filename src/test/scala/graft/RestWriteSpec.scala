package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end proof of the façade's WRITE surface: every reference
  * mutation route (index.js:132-1371) driven over real HTTP with its
  * guard shapes pinned (400 field guards, 403 ownership/role, 404
  * absence, 409 duplicates, capacity and balance rules) and
  * read-your-writes asserted against the corresponding GET. The
  * state-vs-batch w-family hash ties live in [[RestStateTieSpec]] (its
  * own server, so op history is exactly the driven sequence). */
class RestWriteSpec extends AnyFunSuite with RestHttp
    with org.scalatest.BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val started = RestServe.startWithStore(spark, dir, 0)
  private lazy val server = started._1
  override lazy val base = s"http://127.0.0.1:${server.getAddress.getPort}"

  override def afterAll(): Unit = {
    server.stop(0)
    server.getExecutor match {
      case es: java.util.concurrent.ExecutorService => es.shutdown()
      case _ => ()
    }
  }

  // ---- route matcher units (the ADVICE r8 determinism items) ---------

  test("segment matcher: binds refuse empty segments; literal beats bind deterministically") {
    import RestServe.{matchSegs, pickRoute}
    assert(matchSegs(Vector("tasks", "{id}"), Vector("tasks", "7"))
      == Some(Map("id" -> "7")))
    assert(matchSegs(Vector("tasks", "{id}"), Vector("tasks", "")).isEmpty)
    assert(matchSegs(Vector("tasks"), Vector("tasks", "7")).isEmpty)
    // A literal route always beats a {bind} twin of the same length,
    // regardless of listing order; ties break lexicographically.
    val picked = pickRoute(Seq(
      ("bindRoute", "/users/{email}", Map("email" -> "profile")),
      ("literalRoute", "/users/profile", Map.empty[String, String])))
    assert(picked.map(_._1) == Some("literalRoute"))
    val tie = pickRoute(Seq(
      ("b", "/x/{b}", Map("b" -> "1")), ("a", "/x/{a}", Map("a" -> "1"))))
    assert(tie.map(_._1) == Some("a"))
  }

  test("method resolution is per route: PUT-only path answers PATCH with 405, not 404") {
    // /api/submissions/approve/{id} is PUT (index.js:882); the PATCH
    // submission route is 3 segments and cannot shadow it.
    assert(patch("/api/submissions/approve/3-3-14-2", "{}")._1 == 405)
    assert(get("/api/submissions/approve/3-3-14-2")._1 == 405)
    assert(post("/no/such/write", "{}")._1 == 404)
  }

  test("open mode: a client-supplied ?@auth= is stripped, never an identity channel") {
    // identity() trusts "@auth" as the server-injected verified email
    // (RestAuthSpec); on an OPEN façade nothing injects it, so a query
    // spoof must not smuggle one in. Unstripped, this refund would
    // pass the self-only guard as Customer#000000001; stripped, the
    // caller_email stand-in stays the caller and the guard 403s.
    val (c, b) = send("PATCH",
      "/refund-coins?%40auth=Customer%23000000001",
      Some("""{"email":"Customer#000000001","coins":1,"caller_email":"someone@else"}"""))
    assert(c == 403 && b.contains("cannot refund coins"), s"$c $b")
  }

  test("malformed JSON bodies map to 400, never 500") {
    assert(post("/users", "{not json")._1 == 400)
    assert(post("/users", "[1,2,3]")._1 == 400) // non-object
    assert(post("/tasks", "null")._1 == 400)
  }

  // ---- create-payment-intent (index.js:260-276) ------------------------

  test("payment intent: amount validation and the cents rounding of index.js:267") {
    assert(post("/create-payment-intent", "{}")._1 == 400)
    assert(post("/create-payment-intent", """{"amount_usd":"5"}""")._1 == 400) // typeof guard
    assert(post("/create-payment-intent", """{"amount_usd":-3}""")._1 == 400)
    assert(post("/create-payment-intent", """{"amount_usd":0}""")._1 == 400)
    val (c, b) = post("/create-payment-intent", """{"amount_usd":10.555}""")
    assert(c == 200 && b.contains("\"clientSecret\""))
    assert(b.contains("1056"), s"Math.round(10.555*100)=1056 expected in $b")
  }

  // ---- user registration + admin user management ----------------------

  test("user registration: field guard, defaults by role, duplicate 409, profile read-your-writes") {
    assert(post("/users", """{"name":"Ada","email":"ada@x.io"}""")._1 == 400)
    val (c1, b1) = post("/users", """{"name":"Ada","email":"ada@x.io","role":"buyer"}""")
    assert(c1 == 201 && b1.contains("insertedId"))
    assert(post("/users", """{"name":"Imp","email":"ada@x.io","role":"worker"}""")._1 == 409)
    val (c2, b2) = get("/users/profile?name=ada%40x.io")
    assert(c2 == 200)
    assert(b2.contains("\"c_acctbal\":50.0") && b2.contains("\"role\":\"buyer\"")
      && b2.contains("\"name\":\"Ada\""), b2)
    val (c3, _) = post("/users", """{"name":"Wes","email":"wes@x.io","role":"worker"}""")
    assert(c3 == 201)
    assert(get("/users/profile?name=wes%40x.io")._2.contains("\"c_acctbal\":10.0"))
  }

  test("admin role patch: enum guard, unchanged-role 404 (the reference's modifiedCount=0 shape), effect on the buyer guard") {
    assert(patch("/admin/users/ada@x.io/role", """{"role":"queen"}""")._1 == 400)
    assert(patch("/admin/users/ada@x.io/role", """{"role":"buyer"}""")._1 == 404) // unchanged
    assert(patch("/admin/users/nobody@x.io/role", """{"role":"admin"}""")._1 == 404)
    assert(patch("/admin/users/ada@x.io/role", """{"role":"worker"}""")._1 == 200)
    // Role is live: a worker cannot create tasks (index.js:487-489).
    val denied = post("/tasks",
      """{"email":"ada@x.io","task_title":"t","task_detail":"d","required_workers":1,
         "payable_amount":1,"completion_date":"2026-09-01","submission_info":"s"}""")
    assert(denied._1 == 403, denied.toString)
    assert(patch("/admin/users/ada@x.io/role", """{"role":"buyer"}""")._1 == 200)
  }

  test("admin user delete: 404 unknown, then delete-for-real with profile 404 after") {
    assert(delete("/admin/users/ghost@x.io")._1 == 404)
    assert(post("/users", """{"name":"Tmp","email":"tmp@x.io","role":"worker"}""")._1 == 201)
    assert(get("/users/profile?name=tmp%40x.io")._1 == 200)
    assert(delete("/admin/users/tmp@x.io")._1 == 200)
    assert(get("/users/profile?name=tmp%40x.io")._1 == 404)
  }

  // ---- task lifecycle ---------------------------------------------------

  private def taskBody(email: String, title: String, rw: Int, pa: Double): String =
    s"""{"email":"$email","task_title":"$title","task_detail":"detail",
       |"required_workers":$rw,"payable_amount":$pa,
       |"completion_date":"2026-09-01","submission_info":"screenshot"}""".stripMargin

  test("task creation: field/numeric guards, coin-balance guard, debit, point-read of evolved fields") {
    assert(post("/tasks", s"""{"email":"ada@x.io","task_title":"t"}""")._1 == 400)
    assert(post("/tasks", taskBody("ada@x.io", "t", -2, 5))._1 == 400)
    assert(post("/tasks", taskBody("ada@x.io", "t", 2, 0))._1 == 400) // falsy payable → missing
    // Ada has 50 coins; 3 workers × 100 = 300 exceeds the balance.
    val broke = post("/tasks", taskBody("ada@x.io", "too-rich", 3, 100))
    assert(broke._1 == 400 && broke._2.contains("Not enough coins"), broke.toString)
    assert(post("/purchase-coin", """{"email":"ada@x.io","coins":1000,"amount":10}""")._1 == 200)
    assert(get("/users/profile?name=ada%40x.io")._2.contains("\"c_acctbal\":1050.0"))
    val (cc, cb) = post("/tasks", taskBody("ada@x.io", "label-images", 3, 100))
    assert(cc == 201, cb)
    val taskId = "\"taskId\":(\\d+)".r.findFirstMatchIn(cb).get.group(1)
    // Debit: 1050 − 300 (index.js:492-495's $inc −totalCost).
    assert(get("/users/profile?name=ada%40x.io")._2.contains("\"c_acctbal\":750.0"))
    val (gc, gb) = get(s"/tasks/$taskId")
    assert(gc == 200 && gb.contains("\"task_title\":\"label-images\"")
      && gb.contains("\"status\":\"open\"") && gb.contains("\"buyer_email\":\"ada@x.io\""), gb)
    // The full-scan listing sees it too (read-your-writes on a listing).
    assert(get(s"/api/all-tasks?limit=$MaxedCap")._2.contains(s"\"o_orderkey\":$taskId"))
  }
  private val MaxedCap = 10000

  test("task update and delete: ownership guards, then read-your-writes and 404 after delete") {
    val created = post("/tasks", taskBody("ada@x.io", "ephemeral", 1, 10))
    assert(created._1 == 201)
    val id = "\"taskId\":(\\d+)".r.findFirstMatchIn(created._2).get.group(1)
    assert(patch(s"/tasks/$id", """{"task_title":"x"}""")._1 == 400) // missing fields
    val notOwner = patch(s"/tasks/$id",
      """{"email":"wes@x.io","task_title":"x","task_detail":"y","submission_info":"z"}""")
    assert(notOwner._1 == 403)
    val ok = patch(s"/tasks/$id",
      """{"email":"ada@x.io","task_title":"renamed","task_detail":"y","submission_info":"z"}""")
    assert(ok._1 == 200)
    val after = get(s"/tasks/$id")._2
    assert(after.contains("\"task_title\":\"renamed\"") && after.contains("updatedAt"), after)
    assert(delete(s"/tasks/$id?email=wes@x.io")._1 == 403)
    assert(delete(s"/tasks/$id?email=ada@x.io")._1 == 200)
    assert(get(s"/tasks/$id")._1 == 404)
    assert(delete(s"/api/admin/tasks/$id")._1 == 404) // already gone
    assert(delete("/api/admin/tasks/notanid")._1 == 400) // P12 guard
    assert(patch(s"/tasks/notanid",
      """{"email":"a","task_title":"x","task_detail":"y","submission_info":"z"}""")._1 == 400)
  }

  test("fixture tasks belong to their customer: ownership resolves through o_custkey") {
    // Task 7 is a fixture order; its owner is customer o_custkey — any
    // other identity is 403, the owner's c_name email passes.
    val owner = {
      import spark.implicits._
      val ck = Tables(spark, dir).orders.filter($"o_orderkey" === 7L)
        .select($"o_custkey").head().getLong(0)
      Tables(spark, dir).customer.filter($"c_custkey" === ck)
        .select($"c_name").head().getString(0)
    }
    assert(patch("/tasks/7",
      """{"email":"intruder@x.io","task_title":"x","task_detail":"y","submission_info":"z"}""")._1 == 403)
    val ok = patch("/tasks/7",
      s"""{"email":"$owner","task_title":"hijack-proof","task_detail":"y","submission_info":"z"}""")
    assert(ok._1 == 200, ok.toString)
    assert(get("/tasks/7")._2.contains("\"task_title\":\"hijack-proof\""))
  }

  // ---- submissions + notifications --------------------------------------

  test("submission flow: dangling-task 404, insert + buyer notification, worker feed read-your-writes") {
    val created = post("/tasks", taskBody("ada@x.io", "transcribe", 2, 55))
    assert(created._1 == 201)
    val taskId = "\"taskId\":(\\d+)".r.findFirstMatchIn(created._2).get.group(1)
    assert(post("/api/submissions", """{"task_id":999999,"worker_email":"wes@x.io"}""")._1 == 404)
    assert(post("/api/submissions", """{"worker_email":"wes@x.io"}""")._1 == 400)
    val sub = post("/api/submissions",
      s"""{"task_id":$taskId,"worker_email":"wes@x.io","worker_name":"Wes","note":"done"}""")
    assert(sub._1 == 201, sub.toString)
    val subId = "\"id\":\"([-0-9]+)\"".r.findFirstMatchIn(sub._2).get.group(1)
    // Buyer notified (S4): ada's newest notification mentions the task.
    val adaKey = get("/users/profile?name=ada%40x.io")._2 match {
      case b => "\"c_custkey\":(\\d+)".r.findFirstMatchIn(b).get.group(1)
    }
    val notif = get(s"/api/notifications?user=$adaKey&limit=1")._2
    assert(notif.contains("\"event_type\":\"notification\""), notif)
    // Worker feed: wes's submissions listing includes the minted row.
    val wesKey = "\"c_custkey\":(\\d+)".r
      .findFirstMatchIn(get("/users/profile?name=wes%40x.io")._2).get.group(1)
    val feed = get(s"/submissions?user=$wesKey")._2
    assert(feed.contains(s"\"l_orderkey\":$taskId"), feed)

    // Approve: non-owner 403, owner 200, coins +55, repeat 400.
    assert(patch(s"/buyer/submissions/$subId/approve", """{"email":"wes@x.io"}""")._1 == 403)
    val coinsBefore = "\"c_acctbal\":([0-9.]+)".r
      .findFirstMatchIn(get("/users/profile?name=wes%40x.io")._2).get.group(1).toDouble
    assert(patch(s"/buyer/submissions/$subId/approve", """{"email":"ada@x.io"}""")._1 == 200)
    val coinsAfter = "\"c_acctbal\":([0-9.]+)".r
      .findFirstMatchIn(get("/users/profile?name=wes%40x.io")._2).get.group(1).toDouble
    assert(coinsAfter == coinsBefore + 55.0, s"$coinsBefore -> $coinsAfter")
    val again = patch(s"/buyer/submissions/$subId/approve", """{"email":"ada@x.io"}""")
    assert(again._1 == 400 && again._2.contains("already approved"))
    // Worker notified of the approval (index.js:150-158 via the PATCH
    // status route is separate; approve itself notifies nothing — but
    // the generic status PATCH does):
    val st = patch(s"/api/submissions/$subId", """{"email":"ada@x.io","status":"rejected"}""")
    assert(st._1 == 200)
    val wesNotif = get(s"/api/notifications?user=$wesKey&limit=1")._2
    assert(wesNotif.contains("notification"), wesNotif)
  }

  test("malformed field VALUES map to 400 and never 500; key columns cannot be overridden by the body") {
    // A string where the base column is numeric: the store's coercion
    // throws and the dispatch maps it to the 400 shape (review fix).
    val badVal = post("/submissions", """{"task_id":3,"l_quantity":"lots"}""")
    assert(badVal._1 == 400, badVal.toString)
    // An evolved column's type locks on first sight; a later fractional
    // value for an integral column is a LOUD 400, not a silent truncate.
    assert(post("/submissions", """{"task_id":3,"rating":5}""")._1 == 201)
    val frac = post("/submissions", """{"task_id":3,"rating":4.5}""")
    assert(frac._1 == 400, frac.toString)
    // Body keys must not override the composite key: the returned id
    // stays authoritative and addressable.
    val hijack = post("/submissions", """{"task_id":3,"l_orderkey":424242,"note":"x"}""")
    assert(hijack._1 == 201)
    val id = "\"id\":\"([-0-9]+)\"".r.findFirstMatchIn(hijack._2).get.group(1)
    assert(id.startsWith("3-"), s"id $id not keyed by task_id")
    assert(put(s"/api/submissions/approve/$id", "{}")._1 == 200) // addressable
    // Oversized body: bounded read answers 413 (Express's json limit
    // shape), never an OOM-able driver buffer. The server may respond
    // and close before the client finishes streaming — an IOException
    // on the client IS the bounded-read behavior observed early.
    val big = "x" * (1 << 21)
    val code =
      try post("/submissions", s"""{"task_id":3,"blob":"$big"}""")._1
      catch { case _: java.io.IOException => 413 }
    assert(code == 413, s"oversized body answered $code")
  }

  test("unguarded PUT status pair and the second unguarded POST sink") {
    val raw = post("/submissions", """{"task_id":3,"worker_email":"wes@x.io","note":"raw"}""")
    assert(raw._1 == 201, raw.toString)
    val id = "\"id\":\"([-0-9]+)\"".r.findFirstMatchIn(raw._2).get.group(1)
    assert(put(s"/api/submissions/approve/$id", "{}")._1 == 200)
    assert(put(s"/api/submissions/reject/$id", "{}")._1 == 200)
    assert(put("/api/submissions/approve/9-9-9-9999", "{}")._1 == 404)
    assert(put("/api/submissions/approve/garbage", "{}")._1 == 400)
  }

  // ---- withdrawals --------------------------------------------------------

  test("withdrawal flow: field/minimum/balance guards, both approval paths, read-your-writes on the status filter") {
    assert(post("/withdrawals", """{"worker_email":"wes@x.io"}""")._1 == 400)
    val low = post("/withdrawals",
      """{"worker_email":"wes@x.io","worker_name":"Wes","withdrawal_coin":100,
         "withdrawal_amount":5,"payment_system":"bkash","account_number":"1"}""")
    assert(low._1 == 400 && low._2.contains("Minimum withdrawal is 200 coins"))
    assert(post("/withdrawals",
      """{"worker_email":"ghost@x.io","worker_name":"G","withdrawal_coin":200,
         "withdrawal_amount":10,"payment_system":"bkash","account_number":"1"}""")._1 == 404)
    // Wes needs balance: buy 1000 coins first, then over-withdraw fails.
    assert(post("/purchase-coin", """{"email":"wes@x.io","coins":1000,"amount":10}""")._1 == 200)
    val wesCoins = "\"c_acctbal\":([0-9.]+)".r
      .findFirstMatchIn(get("/users/profile?name=wes%40x.io")._2).get.group(1).toDouble
    val tooMuch = post("/withdrawals",
      s"""{"worker_email":"wes@x.io","worker_name":"Wes","withdrawal_coin":${wesCoins.toLong + 500},
          "withdrawal_amount":99,"payment_system":"bkash","account_number":"1"}""")
    assert(tooMuch._1 == 400 && tooMuch._2.contains("Insufficient coins"))
    val ok = post("/withdrawals",
      """{"worker_email":"wes@x.io","worker_name":"Wes","withdrawal_coin":300,
         "withdrawal_amount":15,"payment_system":"bkash","account_number":"1"}""")
    assert(ok._1 == 201, ok.toString)
    val wid = "\"id\":(\\d+)".r.findFirstMatchIn(ok._2).get.group(1)
    assert(get("/admin/withdrawals?status=pending")._2.contains(s"\"o_orderkey\":$wid"))

    // Admin approve: deducts coins and flips status (index.js:1336-1371).
    assert(post(s"/admin/withdrawals/$wid/approve", "{}")._1 == 200)
    val afterCoins = "\"c_acctbal\":([0-9.]+)".r
      .findFirstMatchIn(get("/users/profile?name=wes%40x.io")._2).get.group(1).toDouble
    assert(afterCoins == wesCoins - 300.0, s"$wesCoins -> $afterCoins")
    assert(get("/admin/withdrawals?status=approved")._2.contains(s"\"o_orderkey\":$wid"))
    assert(post(s"/admin/withdrawals/$wid/approve", "{}")._1 == 400) // already approved
    assert(post("/admin/withdrawals/424242/approve", "{}")._1 == 404)

    // The reference's SECOND approval path (PATCH /api/withdrawals/:id)
    // deliberately moves NO coins — divergence kept verbatim.
    val ok2 = post("/withdrawals",
      """{"worker_email":"wes@x.io","worker_name":"Wes","withdrawal_coin":200,
         "withdrawal_amount":10,"payment_system":"bkash","account_number":"1"}""")
    assert(ok2._1 == 201)
    val wid2 = "\"id\":(\\d+)".r.findFirstMatchIn(ok2._2).get.group(1)
    val before2 = "\"c_acctbal\":([0-9.]+)".r
      .findFirstMatchIn(get("/users/profile?name=wes%40x.io")._2).get.group(1).toDouble
    assert(patch(s"/api/withdrawals/$wid2", "{}")._1 == 200)
    val after2 = "\"c_acctbal\":([0-9.]+)".r
      .findFirstMatchIn(get("/users/profile?name=wes%40x.io")._2).get.group(1).toDouble
    assert(after2 == before2, "the unguarded approval path must not move coins")
    assert(get("/admin/withdrawals?status=approved")._2.contains(s"\"o_orderkey\":$wid2"))
    // Worker notified of the approval (index.js:184-189).

    // FIXTURE withdrawals are approvable through the guarded path too:
    // worker resolution falls back to the o_custkey user (review fix —
    // without it every fixture row 404'd here while the unguarded
    // PATCH succeeded on the same row).
    assert(post("/admin/withdrawals/7/approve", "{}")._1 == 200)
    assert(get("/admin/withdrawals?status=approved")._2.contains("\"o_orderkey\":7,"))
    assert(post("/admin/withdrawals/7/approve", "{}")._1 == 400) // now already approved
  }

  // ---- payments record + notification ownership ---------------------------

  test("payments record: guard, insert visible in the per-user feed, coins credited") {
    assert(post("/api/payments/record", """{"email":"ada@x.io","coins":7}""")._1 == 400)
    val adaKey = "\"c_custkey\":(\\d+)".r
      .findFirstMatchIn(get("/users/profile?name=ada%40x.io")._2).get.group(1)
    val before = "\"c_acctbal\":([0-9.]+)".r
      .findFirstMatchIn(get("/users/profile?name=ada%40x.io")._2).get.group(1).toDouble
    assert(post("/api/payments/record",
      """{"email":"ada@x.io","amount_usd":9.5,"coins":95}""")._1 == 200)
    val after = "\"c_acctbal\":([0-9.]+)".r
      .findFirstMatchIn(get("/users/profile?name=ada%40x.io")._2).get.group(1).toDouble
    assert(after == before + 95.0)
    val feed = get(s"/payments?user=$adaKey&limit=3")._2
    assert(feed.contains("\"o_totalprice\":9.5"), feed)
  }

  test("notification delete: identity required, ownership 403, then delete with feed read-your-writes") {
    // Fixture event 5 belongs to user 10.
    assert(delete("/api/notifications/5")._1 == 400) // no identity
    assert(delete("/api/notifications/5?user=9999")._1 == 403)
    assert(delete("/api/notifications/424242?user=10")._1 == 404)
    val before = get("/api/notifications?user=10&limit=10000")._2
    assert(before.contains("\"event_id\":5"))
    assert(delete("/api/notifications/5?user=10")._1 == 200)
    val afterFeed = get("/api/notifications?user=10&limit=10000")._2
    assert(!afterFeed.contains("\"event_id\":5,"), "deleted notification still served")
    assert(delete("/api/notifications/5?user=10")._1 == 404) // tombstoned
  }
}
