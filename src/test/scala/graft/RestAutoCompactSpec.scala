package graft

import org.scalatest.funsuite.AnyFunSuite

/** Auto-compaction: the journal is driver state, so it must be BOUNDED
  * — a store configured with a small threshold drains any entity whose
  * journal crosses it into a materialized base (the LSM discipline),
  * with reads intact across the fold and subsequent writes journaling
  * afresh. The default threshold (4096) never fires in the other
  * suites, so this one runs its own low-threshold server. */
class RestAutoCompactSpec extends AnyFunSuite with RestHttp
    with org.scalatest.BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val started = RestServe.startWithStore(spark, dir, 0, autoCompactAt = 5)
  private lazy val server = started._1
  private lazy val store = started._2
  override lazy val base = s"http://127.0.0.1:${server.getAddress.getPort}"

  override def afterAll(): Unit = {
    server.stop(0)
    server.getExecutor match {
      case es: java.util.concurrent.ExecutorService => es.shutdown()
      case _ => ()
    }
  }

  test("crossing the journal threshold folds the entity into its base; reads and later writes survive") {
    val users = (101 to 106).map(i => f"Customer#$i%09d")
    users.foreach { u =>
      assert(post("/purchase-coin", s"""{"email":"$u","coins":10,"amount":1}""")._1 == 200)
    }
    // The 6th mutation crossed the threshold on BOTH touched entities
    // (users: 6 patched keys; payments: 6 inserts) — journals drained.
    assert(store.users.journalSize == 0, s"users journal ${store.users.journalSize}")
    assert(store.payments.journalSize == 0)
    // Reads over the compacted base: every balance kept its credit.
    users.foreach { u =>
      val enc = java.net.URLEncoder.encode(u, "UTF-8")
      val body = get(s"/users/profile?name=$enc")._2
      val bal = "\"c_acctbal\":([0-9.]+)".r.findFirstMatchIn(body).get.group(1).toDouble
      val baseBal = {
        import spark.implicits._
        Tables(spark, dir).customer.filter($"c_name" === u)
          .select($"c_acctbal").head().getDouble(0)
      }
      assert(bal == baseBal + 10.0, s"$u: $bal != $baseBal+10")
    }
    // Payments survived the fold and still serve newest-first.
    val u101key = {
      import spark.implicits._
      Tables(spark, dir).customer.filter($"c_name" === users.head)
        .select($"c_custkey").head().getLong(0)
    }
    assert(get(s"/payments?user=$u101key&limit=3")._2.contains("\"o_totalprice\":1.0"))
    // A later write journals afresh on the new base.
    assert(post("/purchase-coin",
      s"""{"email":"${users.head}","coins":5,"amount":1}""")._1 == 200)
    assert(store.users.journalSize == 1)
    val body = get(s"/users/profile?name=${java.net.URLEncoder.encode(users.head, "UTF-8")}")._2
    val bal = "\"c_acctbal\":([0-9.]+)".r.findFirstMatchIn(body).get.group(1).toDouble
    val baseBal = {
      import spark.implicits._
      Tables(spark, dir).customer.filter($"c_name" === users.head)
        .select($"c_acctbal").head().getDouble(0)
    }
    assert(bal == baseBal + 15.0)
  }
}
