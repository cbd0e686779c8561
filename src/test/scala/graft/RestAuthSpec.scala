package graft

import org.scalatest.funsuite.AnyFunSuite

/** The reference's three auth middlewares, live over real HTTP against
  * an auth-armed façade:
  *
  *   - `verifyFBToken` (index.js:93-110): 401 on a missing/non-Bearer
  *     header, 401 on an empty token, 403 on a bad signature; a valid
  *     token's email IS the caller identity (`req.decoded.email`).
  *   - `verifyRole([...])` (index.js:70-89): a live point lookup of the
  *     caller's role in the users store — 403
  *     "Access denied: insufficient permissions" otherwise.
  *   - `verifyAdmin` (index.js:115-129): same lookup, role must be
  *     'admin' — 403 "Admin access required" otherwise.
  *
  * The dataflow pins: role checks read the MERGED users view, so a
  * role PATCH (or user DELETE) changes what the very next request may
  * do; the verified email overrides any body/param identity; the
  * "@auth" injection channel cannot be spoofed from the query string;
  * middleware order matches Express (405 before auth, auth before
  * query decode, gate before handler). Route-chain fidelity: every
  * route's AuthReq is cited to its index.js registration in
  * RestServe's table; the reference's UNGUARDED routes stay open here.
  */
class RestAuthSpec extends AnyFunSuite with RestHttp
    with org.scalatest.BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private val secret = "graft-spec-secret"

  private lazy val started =
    RestServe.startWithStore(spark, dir, 0, authSecret = Some(secret))
  private lazy val server = started._1
  override lazy val base = s"http://127.0.0.1:${server.getAddress.getPort}"

  private def tok(email: String) = GraftAuth.token(secret, email)

  // Fresh identities registered through the OPEN /users route (the
  // reference's own registration path needs no token, index.js:377).
  private lazy val ids: Unit = {
    assert(post("/users", """{"name":"Root","email":"root@a.io","role":"admin"}""")._1 == 201)
    assert(post("/users", """{"name":"Bea","email":"bea@a.io","role":"buyer"}""")._1 == 201)
    assert(post("/users", """{"name":"Wes","email":"wes@a.io","role":"worker"}""")._1 == 201)
  }

  override def afterAll(): Unit = {
    server.stop(0)
    server.getExecutor match {
      case es: java.util.concurrent.ExecutorService => es.shutdown()
      case _ => ()
    }
  }

  // ---- GraftAuth kernel ------------------------------------------------

  test("token kernel: round-trip, tamper, wrong secret, malformed") {
    val t = GraftAuth.token("s1", "x@y.z")
    assert(GraftAuth.verify("s1", t) == Some("x@y.z"))
    assert(GraftAuth.verify("s2", t).isEmpty)             // wrong secret
    val Array(p, s) = t.split("\\.", 2)
    val other = GraftAuth.token("s1", "a@y.z").split("\\.", 2)
    assert(GraftAuth.verify("s1", other(0) + "." + s).isEmpty) // payload swap
    assert(GraftAuth.verify("s1", p + "." + other(1)).isEmpty) // sig swap
    assert(GraftAuth.verify("s1", "no-dot").isEmpty)
    assert(GraftAuth.verify("s1", "!!!.???").isEmpty)     // bad base64
    assert(GraftAuth.verify("s1", p + ".").isEmpty)       // empty sig
  }

  test("token expiry: expired is the 403 (Firebase throws on expired); exp rides inside the MAC") {
    ids
    val now = System.currentTimeMillis() / 1000L
    val live = GraftAuth.token(secret, "bea@a.io", Some(now + 3600))
    assert(GraftAuth.verify(secret, live).contains("bea@a.io"))
    val dead = GraftAuth.token(secret, "bea@a.io", Some(now - 1))
    assert(GraftAuth.verify(secret, dead).isEmpty)
    // exp is strictly-greater: a token expiring AT now is expired.
    assert(GraftAuth.verify(secret,
      GraftAuth.token(secret, "x@y.z", Some(123L)), nowEpochSec = 123L).isEmpty)
    assert(GraftAuth.verify(secret,
      GraftAuth.token(secret, "x@y.z", Some(123L)), nowEpochSec = 122L).contains("x@y.z"))
    // Splicing an expired token's signature onto an extended-expiry
    // payload is a forgery: the exp is part of the MAC'd payload.
    val sig = dead.split("\\.", 2)(1)
    val stretched = java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(s"bea@a.io\n${now + 9999}".getBytes("UTF-8"))
    assert(GraftAuth.verify(secret, stretched + "." + sig).isEmpty)
    // Over HTTP: the expired token is verifyFBToken's one 403.
    val (c, b) = auth(dead).get("/buyer/home")
    assert(c == 403 && b.contains("invalid token"), s"$c $b")
    assert(auth(live).get("/buyer/home")._1 == 200)
  }

  // ---- verifyFBToken status split (index.js:93-110) ---------------------

  test("verifyFBToken: 401 missing header, 401 non-Bearer, 401 empty token, 403 bad signature") {
    val (c1, b1) = get("/buyer/home")
    assert(c1 == 401 && b1.contains("missing or invalid Authorization header"))
    assert(send("GET", "/buyer/home", None,
      Map("Authorization" -> "Basic dXNlcg=="))._1 == 401)
    // A bare "Bearer " is OWS-trimmed to "Bearer" by every compliant
    // HTTP parser (Node's included), so on the wire it is the FIRST
    // 401; the missing-token SECOND 401 is only reachable via
    // "Bearer  x" (split(' ')[1] == "" with the token intact at [2]).
    val (c2, b2) = send("GET", "/buyer/home", None, Map("Authorization" -> "Bearer "))
    assert(c2 == 401 && b2.contains("missing or invalid Authorization header"))
    val (c2b, b2b) = send("GET", "/buyer/home", None,
      Map("Authorization" -> ("Bearer  " + tok("bea@a.io"))))
    assert(c2b == 401 && b2b.contains("missing token"))
    val (c3, b3) = send("GET", "/buyer/home", None,
      Map("Authorization" -> ("Bearer " + tok("bea@a.io") + "x")))
    assert(c3 == 403 && b3.contains("invalid token"))
  }

  test("a valid token answers, and the payload equals the catalog twin (auth gate leaves the data plane alone)") {
    ids
    val (c, body) = auth(tok("bea@a.io")).get("/buyer/home")
    assert(c == 200)
    val twin = SparkEntry.queries("flagship_buyer_home")(spark, dir)
      .limit(1000).toJSON.collect().mkString("[", ",", "]")
    assert(body == twin)
  }

  test("the reference's unguarded routes stay open: no header needed") {
    assert(get("/top-workers")._1 == 200)          // index.js:1237
    assert(get("/api/all-tasks")._1 == 200)        // :532
    assert(get("/admin/tasks")._1 == 200)          // :1166 — unguarded in the reference, verbatim
    assert(get("/tasks/1")._1 == 200)              // :1017
    assert(get("/")._1 == 200)
    assert(post("/submissions", """{"task_id":1}""")._1 == 201) // :924
  }

  // ---- middleware order --------------------------------------------------

  test("order: 405 resolves before auth; auth resolves before the handler reads the query") {
    // DELETE on the GET-only /buyer/home: the method mismatch answers
    // before any token check.
    assert(send("DELETE", "/buyer/home", None)._1 == 405)
    // Express order: middlewares fire before the handler ever reads a
    // request parameter. /submissions requires ?user= (the reference's
    // 'Email is required' 400, index.js:1003 — no identity match on
    // this route), but with no token the gate's 401 answers first.
    val (c1, b1) = get("/submissions")
    assert(c1 == 401 && b1.contains("Unauthorized"), s"$c1 $b1")
    val (c2, b2) = auth(tok("bea@a.io")).get("/submissions")
    assert(c2 == 400 && b2.contains("missing or malformed parameter"), s"$c2 $b2")
    // Wire caveat, pinned: a malformed request-TARGET encoding (%GG)
    // never reaches any middleware — the HTTP layer itself rejects it
    // with 400 (token or not), exactly as Node's parser pre-rejects a
    // bad request line before Express's chain runs.
    def raw(headers: String): String = {
      val sock = new java.net.Socket("127.0.0.1", server.getAddress.getPort)
      try {
        sock.getOutputStream.write(
          (s"GET /payments?user=%GG HTTP/1.1\r\nHost: x\r\n${headers}Connection: close\r\n\r\n")
            .getBytes("US-ASCII"))
        sock.getOutputStream.flush()
        new String(sock.getInputStream.readNBytes(16), "US-ASCII")
      } finally sock.close()
    }
    assert(raw("").contains("400"), raw(""))
    assert(raw(s"Authorization: Bearer ${tok("bea@a.io")}\r\n").contains("400"))
  }

  // ---- verifyRole (index.js:70-89) ---------------------------------------

  test("verifyRole(buyer) on PATCH /api/submissions/{id}: worker 403, buyer reaches the handler") {
    ids
    val req = """{"status":"approved"}"""
    val (cw, bw) = auth(tok("wes@a.io")).patch("/api/submissions/999999-1-0-0", req)
    assert(cw == 403 && bw.contains("Access denied: insufficient permissions"))
    // Same request under a buyer: the gate passes and the HANDLER's
    // 404 answers — middleware-before-handler, pinned by the split.
    assert(auth(tok("bea@a.io")).patch("/api/submissions/999999-1-0-0", req)._1 == 404)
  }

  test("verifyRole(worker) on POST /api/submissions: buyer 403, worker passes the gate") {
    ids
    assert(auth(tok("bea@a.io")).post("/api/submissions", """{"task_id":1}""")._1 == 403)
    val (cw, _) = auth(tok("wes@a.io")).post("/api/submissions", """{"task_id":999999}""")
    assert(cw == 404) // gate passed; handler's dangling-task guard answered
  }

  test("a validly-signed token for an UNREGISTERED email: verifyFBToken accepts (Firebase never reads the users table), role gates reject") {
    val ghost = tok("ghost@a.io")
    // Plain-token route: the gate passes; the route's own buyer guard
    // then sees no user.
    val (c1, b1) = auth(ghost).post("/tasks",
      """{"task_title":"t","task_detail":"d","required_workers":1,
         "payable_amount":1,"completion_date":"2026-01-01","submission_info":"s"}""")
    assert(c1 == 403 && b1.contains("Only buyers can create tasks"))
    // Role route: verifyRole's !user branch → its 403.
    val (c2, b2) = auth(ghost).post("/api/submissions", """{"task_id":1}""")
    assert(c2 == 403 && b2.contains("insufficient permissions"))
  }

  // ---- verifyAdmin (index.js:115-129) -------------------------------------

  test("verifyAdmin: buyer and worker 403, admin 200; role PATCH flips authorization on the NEXT request") {
    ids
    val (cb, bb) = auth(tok("bea@a.io")).get("/admin/users")
    assert(cb == 403 && bb.contains("Admin access required"))
    assert(auth(tok("wes@a.io")).get("/admin/withdrawals")._1 == 403)
    assert(auth(tok("root@a.io")).get("/admin/users")._1 == 200)
    // Promote the buyer; the SAME token now clears verifyAdmin — the
    // role check is a live read of the merged users view.
    assert(auth(tok("root@a.io"))
      .patch("/admin/users/bea@a.io/role", """{"role":"admin"}""")._1 == 200)
    assert(auth(tok("bea@a.io")).get("/admin/users")._1 == 200)
    // And back, so later tests see the original role.
    assert(auth(tok("root@a.io"))
      .patch("/admin/users/bea@a.io/role", """{"role":"buyer"}""")._1 == 200)
    assert(auth(tok("bea@a.io")).get("/admin/users")._1 == 403)
  }

  test("deleting a user revokes admin despite a valid signature") {
    ids
    assert(post("/users", """{"name":"Tmp","email":"tmp@a.io","role":"admin"}""")._1 == 201)
    assert(auth(tok("tmp@a.io")).get("/admin/home")._1 == 200)
    assert(auth(tok("root@a.io")).delete("/admin/users/tmp@a.io")._1 == 200)
    val (c, b) = auth(tok("tmp@a.io")).get("/admin/home")
    assert(c == 403 && b.contains("Admin access required"))
  }

  // ---- verified email is the caller identity -------------------------------

  test("refund-coins: the token email is decoded.email — body email must match (index.js:716-718)") {
    ids
    val (c1, b1) = auth(tok("wes@a.io")).patch("/refund-coins",
      """{"email":"bea@a.io","coins":5}""")
    assert(c1 == 403 && b1.contains("cannot refund coins for another user"))
    assert(auth(tok("wes@a.io")).patch("/refund-coins",
      """{"email":"wes@a.io","coins":5}""")._1 == 200)
  }

  test("token identity overrides a lying body email") {
    ids
    // Worker token + buyer body email: the gate uses the TOKEN email,
    // so the buyer-role task guard fires.
    val taskBody =
      """{"email":"bea@a.io","task_title":"t","task_detail":"d",
         "required_workers":1,"payable_amount":1,
         "completion_date":"2026-01-01","submission_info":"s"}"""
    val (c, b) = auth(tok("wes@a.io")).post("/tasks", taskBody)
    assert(c == 403 && b.contains("Only buyers can create tasks"))
    assert(auth(tok("bea@a.io")).post("/tasks", taskBody)._1 == 201)
  }

  test("8 parallel clients under mixed tokens: every response equals its serial twin") {
    ids
    // Mixed identities, including a forged token and a bare request —
    // the auth decision must be per-request, never bleeding across the
    // server executor's threads.
    val probes: Seq[(String, () => (Int, String))] = Seq(
      "buyer/home(bea)"   -> (() => auth(tok("bea@a.io")).get("/buyer/home")),
      "worker/home(wes)"  -> (() => auth(tok("wes@a.io")).get("/api/worker/home")),
      "admin/users(root)" -> (() => auth(tok("root@a.io")).get("/admin/users")),
      "admin/home(root)"  -> (() => auth(tok("root@a.io")).get("/admin/home")),
      "admin/users(bea)"  -> (() => auth(tok("bea@a.io")).get("/admin/users")),
      "buyer/home(forged)" -> (() => auth(tok("bea@a.io") + "x").get("/buyer/home")),
      "top-workers(none)" -> (() => get("/top-workers")),
      "payments(wes,foreign-key)" -> (() =>
        auth(tok("wes@a.io")).get("/payments?user=3&limit=5")))
    val serial = probes.map { case (n, f) => n -> f() }.toMap
    assert(serial("buyer/home(bea)")._1 == 200 && serial("admin/users(bea)")._1 == 403
      && serial("buyer/home(forged)")._1 == 403 && serial("top-workers(none)")._1 == 200
      && serial("payments(wes,foreign-key)")._1 == 403) // identity guard, index.js:429-431
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val results = Await.result(
      Future.sequence(probes.map { case (n, f) => Future(n -> f()) }), 120.seconds)
    results.foreach { case (n, got) =>
      assert(got == serial(n), s"parallel auth response diverged on $n")
    }
  }

  test("@auth cannot be spoofed from the query string") {
    ids
    // Armed server: a client-supplied ?@auth= must not impersonate.
    val (c, _) = send("PATCH", "/refund-coins?%40auth=bea%40a.io",
      Some("""{"email":"bea@a.io","coins":5}"""))
    assert(c == 401) // token check still fires first
    // And WITH a token, the injected channel wins over the spoof.
    val (c2, b2) = auth(tok("wes@a.io")).patch(
      "/refund-coins?%40auth=bea%40a.io", """{"email":"bea@a.io","coins":5}""")
    assert(c2 == 403 && b2.contains("cannot refund coins"))
  }

  // ---- armed identity on the parameterized entity reads --------------------

  /** wes's own custkey, read through the open profile route. */
  private def keyOf(email: String): Long = {
    val (c, b) = get("/users/profile?name=" +
      java.net.URLEncoder.encode(email, "UTF-8"))
    assert(c == 200, s"profile($email) -> $c $b")
    """"c_custkey":(\d+)""".r.findFirstMatchIn(b).get.group(1).toLong
  }

  test("GET /payments armed: the query identity must equal the token identity (index.js:429-431)") {
    ids
    val wesKey = keyOf("wes@a.io")
    assert(auth(tok("wes@a.io")).get(s"/payments?user=$wesKey")._1 == 200)
    // Another user's key: the reference's only cross-user read guard.
    val (c1, b1) = auth(tok("wes@a.io")).get("/payments?user=1")
    assert(c1 == 403 && b1.contains("Unauthorized"), s"$c1 $b1")
    // Missing query identity is ALSO the 403 (!email || mismatch).
    assert(auth(tok("wes@a.io")).get("/payments")._1 == 403)
    // A signed token whose email has no users row can match no key.
    assert(auth(tok("ghost@a.io")).get(s"/payments?user=$wesKey")._1 == 403)
  }

  test("GET /api/notifications armed: the token alone selects the feed; DELETE ownership is identity-only (index.js:228-231, :249)") {
    ids
    // Manufacture a notification the reference way: a worker submission
    // notifies the task's buyer owner (fixture task 1's o_custkey user).
    assert(auth(tok("wes@a.io")).post("/api/submissions", """{"task_id":1}""")._1 == 201)
    val (tc, tb) = get("/tasks/1")
    assert(tc == 200)
    val buyerKey = """"o_custkey":(\d+)""".r.findFirstMatchIn(tb).get.group(1).toLong
    val buyerEmail = f"Customer#$buyerKey%09d"
    val (fc, fb) = auth(tok(buyerEmail)).get("/api/notifications")
    assert(fc == 200 && fb.contains("\"event_id\""), s"buyer feed: $fc $fb")
    val notifId = """"event_id":(\d+)""".r.findFirstMatchIn(fb).get.group(1).toLong
    // ?user= is ignored armed: wes pointing at the buyer's key still
    // reads WES's feed — the buyer's notification must not appear.
    val (sc, sb) = auth(tok("wes@a.io")).get(s"/api/notifications?user=$buyerKey")
    assert(sc == 200 && !sb.contains(s""""event_id":$notifId"""), s"spoofed feed leaked: $sb")
    // DELETE: wes cannot delete the buyer's notification, with or
    // without the (dead, armed) ?user= channel.
    assert(auth(tok("wes@a.io")).delete(s"/api/notifications/$notifId")._1 == 403)
    assert(auth(tok("wes@a.io")).delete(s"/api/notifications/$notifId?user=$buyerKey")._1 == 403)
    // The owner deletes it, and the feed reflects that (read-your-writes).
    assert(auth(tok(buyerEmail)).delete(s"/api/notifications/$notifId")._1 == 200)
    val (fc2, fb2) = auth(tok(buyerEmail)).get("/api/notifications")
    assert(fc2 == 200 && !fb2.contains(s""""event_id":$notifId"""))
  }
}
