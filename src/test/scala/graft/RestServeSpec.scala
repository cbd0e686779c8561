package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end proof of the REST façade (RestServe): real HTTP requests
  * against a live server, each response hash-equal to the catalog
  * DataFrame program it claims to serve — the reference's GET surface
  * (SURVEY Appendix A) answered by this engine. Plus the façade's own
  * contracts: the 404/400/405 shapes, the dynamic-predicate branch
  * pair, the serving cap, and an 8-client parallel probe (stateless
  * handlers — no cross-request bleed, the ThriftServerSpec posture on
  * this second wire surface). */
class RestServeSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val server = RestServe.start(spark, dir, 0) // ephemeral port

  override def afterAll(): Unit = {
    server.stop(0) // releases the port; the executor is ours to stop
    server.getExecutor match {
      case es: java.util.concurrent.ExecutorService => es.shutdown()
      case _ => ()
    }
  }
  private lazy val base = s"http://127.0.0.1:${server.getAddress.getPort}"
  private val client = HttpClient.newHttpClient()

  private def get(path: String): (Int, String) = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(base + path)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def catalogJson(name: String, limit: Int = 1000): String =
    SparkEntry.queries(name)(spark, dir).limit(limit)
      .toJSON.collect().mkString("[", ",", "]")

  test("health route answers") {
    val (code, body) = get("/")
    assert(code == 200 && body.contains("running"))
  }

  test("dashboard routes serve the exact catalog flagship results") {
    for ((route, q) <- Seq(
        "/buyer/home" -> "flagship_buyer_home",
        "/api/worker/home" -> "flagship_worker_home",
        "/admin/home" -> "flagship_admin_home",
        "/admin/stats" -> "a1_filtered_counts",
        "/api/buyer/stats" -> "a5_conditional_counts",
        "/top-workers" -> "o2_topk",
        "/buyer/submissions" -> "j1_semi_join")) {
      val (code, body) = get(route)
      assert(code == 200, s"$route -> $code")
      assert(body == catalogJson(q), s"$route != catalog $q")
    }
  }

  test("dashboard memo: repeated default-cap GETs serve identical bytes; a custom ?limit= renders live") {
    // The memoized (default-cap) payload is byte-stable across hits...
    val a = get("/top-workers")
    val b = get("/top-workers")
    assert(a._1 == 200 && a == b)
    // ...and a custom limit bypasses the memo but still equals the
    // live catalog render at that cap (the memo can never go stale
    // because the program reads only the immutable fixture lake).
    val (c7, b7) = get("/top-workers?limit=7")
    assert(c7 == 200 && b7 == catalogJson("o2_topk", 7), s"$c7")
    assert(get("/top-workers?limit=0") == ((200, "[]")))
  }

  test("point lookup by path id: found row, 404 on absence, 400 on garbage") {
    import spark.implicits._
    val (code, body) = get("/tasks/7")
    assert(code == 200)
    val want = Tables(spark, dir).orders.filter($"o_orderkey" === 7L)
      .toJSON.collect().mkString("[", ",", "]")
    assert(body == want)
    assert(get("/tasks/99999999")._1 == 404)
    assert(get("/tasks/notanid")._1 == 400)
  }

  test("parameterized profile lookup and the missing-parameter shape") {
    import spark.implicits._
    val (code, body) = get("/users/profile?name=Customer%23000000042")
    assert(code == 200)
    val want = Tables(spark, dir).customer
      .filter($"c_name" === "Customer#000000042")
      .toJSON.collect().mkString("[", ",", "]")
    assert(body == want && body.length > 2)
    assert(get("/users/profile")._1 == 400)
    assert(get("/users/profile?name=Customer%23nobody")._1 == 404)
  }

  test("dynamic-predicate route: both branches (param present / absent)") {
    import spark.implicits._
    val withP = get("/admin/withdrawals?status=P")
    val all = get("/admin/withdrawals")
    assert(withP._1 == 200 && all._1 == 200)
    val orders = Tables(spark, dir).orders
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select($"o_orderkey", $"o_orderstatus").orderBy($"o_orderkey")
        .limit(1000).toJSON.collect().mkString("[", ",", "]")
    assert(withP._2 == shape(orders.filter($"o_orderstatus" === "P")))
    assert(all._2 == shape(orders))
    assert(withP._2 != all._2)
  }

  test("per-user feed is key-bounded and honors the serving cap") {
    import spark.implicits._
    val (code, body) = get("/api/notifications?user=12&limit=5")
    assert(code == 200)
    val want = Tables(spark, dir).events.filter($"user_id" === 12L)
      .select($"event_id", $"ts", $"event_type")
      .orderBy($"ts".desc, $"event_id".desc).limit(5)
      .toJSON.collect().mkString("[", ",", "]")
    assert(body == want)
    assert(body.count(_ == '{') == 5)
    // Clamp contract: non-positive and oversized limits stay servable
    // (never an engine AnalysisException surfacing as a 500).
    val clamped = get("/api/all-tasks?limit=-1")
    assert(clamped._1 == 200 && clamped._2.count(_ == '{') == 0)
    assert(get("/api/all-tasks?limit=999999999")._1 == 200)
    // limit=0 is a legal empty-listing request, not clamped up to 1.
    val zero = get("/api/all-tasks?limit=0")
    assert(zero._1 == 200 && zero._2 == "[]")
    // Percent-encoded parameter KEYS match like their plain spellings
    // (RFC 3986 equivalence: us%65r = user).
    assert(get("/api/notifications?us%65r=12&limit=5")._2
      == get("/api/notifications?user=12&limit=5")._2)
  }

  test("every GET route the reference registers answers with 200 and a parseable body") {
    // index.js's full app.get surface (dups share their live twin).
    val allGets = Seq(
      "/", "/buyer/home", "/api/worker/home", "/admin/home", "/admin/stats",
      "/api/buyer/stats", "/top-workers", "/buyer/tasks", "/buyer-tasks",
      "/worker/tasks", "/admin/users", "/buyer/submissions",
      "/api/buyer/pending-submissions", "/api/all-tasks", "/admin/tasks",
      "/submissions?user=3", "/admin/withdrawals",
      "/api/notifications?user=12", "/payments?user=42",
      "/users/profile?name=Customer%23000000042", "/tasks/7")
    allGets.foreach { p =>
      val (code, body) = get(p)
      assert(code == 200, s"$p -> $code")
      assert(body.nonEmpty, s"$p empty body")
      if (p != "/") assert(body.startsWith("["), s"$p not a JSON array")
    }
    assert(get("/no/such/route")._1 == 404)
  }

  test("wrong method on a GET-only route is 405; unknown method on a write path too") {
    // The write surface lives in RestWriteSpec; here we pin that METHOD
    // resolution is per-route: a mutation verb on a read-only path is a
    // 405 (never a 404 or a 500), and vice versa.
    val del = client.send(
      HttpRequest.newBuilder(URI.create(base + "/buyer/home"))
        .DELETE().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(del.statusCode() == 405)
    val get = client.send(
      HttpRequest.newBuilder(URI.create(base + "/refund-coins")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(get.statusCode() == 405) // PATCH-only path answers GET with 405
    // ADVICE r8: method resolution precedes query processing — a
    // non-GET with a query string on a GET-only path is a 405, never a
    // query-shaped 400. (A %%%-broken query can't drive this: the JDK
    // HttpServer pre-rejects it with its OWN 400 before any handler.)
    val withQuery = client.send(
      HttpRequest.newBuilder(URI.create(base + "/buyer/home?x=1"))
        .DELETE().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(withQuery.statusCode() == 405)
  }

  test("adversarial query strings never produce a 500: every malformed input maps to a contract status") {
    // The facade's whole error surface is 200/400/404/405 — a 500 means
    // an engine exception leaked through the wire contract.
    val adversarial = Seq(
      "/tasks/",                         // empty id segment
      "/tasks/%20",                      // whitespace id
      "/tasks/9999999999999999999999",   // overflows Long
      "/api/notifications?user=",        // empty param value
      "/api/notifications?user=NaN",
      "/api/notifications?user=12&user=13", // duplicate key
      "/api/all-tasks?limit=",           // empty limit
      "/api/all-tasks?limit=2147483648", // overflows Int
      "/api/all-tasks?limit=--5",
      "/users/profile?name=",            // empty name → no row
      "/users/profile?name=%27%3B%20DROP%20TABLE%20x%3B--", // injection text is just a key value
      "/admin/withdrawals?status=%00",
      "/buyer/tasks?limit=1&junk=%%%")   // malformed percent-encoding in an IGNORED param
    adversarial.foreach { p =>
      val code = try client.send(
        HttpRequest.newBuilder(URI.create(base + p)).GET().build(),
        HttpResponse.BodyHandlers.ofString()).statusCode()
      catch { case _: IllegalArgumentException => 400 } // URI itself invalid → client-side reject
      assert(code != 500, s"$p leaked a 500")
      assert(Set(200, 400, 404).contains(code), s"$p -> $code")
    }
  }

  test("raw-socket request with broken percent-encoding gets the 400 shape, not a 500") {
    // The JDK HttpClient pre-rejects malformed URIs, so this path is
    // only reachable by a raw client — exactly what the server-side
    // decode guard exists for.
    val sock = new java.net.Socket("127.0.0.1", server.getAddress.getPort)
    try {
      val out = sock.getOutputStream
      out.write("GET /buyer/tasks?junk=%%% HTTP/1.1\r\nHost: x\r\nConnection: close\r\n\r\n"
        .getBytes("US-ASCII"))
      out.flush()
      val status = new String(sock.getInputStream.readNBytes(16), "US-ASCII")
      assert(status.contains("400"), status)
    } finally sock.close()
  }

  test("8 parallel clients on mixed routes: every response equals its serial twin") {
    val probes = Seq(
      "/buyer/home", "/api/worker/home", "/admin/home", "/top-workers",
      "/tasks/7", "/admin/withdrawals?status=P",
      "/api/notifications?user=12&limit=5", "/api/buyer/stats")
    val serial = probes.map(p => p -> get(p)).toMap
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val results = Await.result(
      Future.sequence(probes.map(p => Future(p -> get(p)))), 120.seconds)
    results.foreach { case (p, got) =>
      assert(got == serial(p), s"parallel response diverged on $p")
    }
  }
}
