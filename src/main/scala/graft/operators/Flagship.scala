package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M0 — the flagship analytic read.
  *
  * Restates the reference's `GET /buyer/home` (/root/reference/index.js:542-589,
  * SURVEY.md §3.1) on the fixture star schema: "a buyer's tasks, their
  * submissions, status counts, and total spend" becomes "a market segment's
  * customers, their orders' lineitems, return-flag status counts, and exact
  * revenue" — one declarative plan instead of four sequential network hops.
  *
  * Operators exercised (SURVEY §2): P4 equality filter, P11 key projection,
  * J1 semi-join, A5 conditional counts, A6 null-safe sum, F10 coalesce
  * defaults, A7 grouped form.
  *
  * Scale: customer-filter → orders is a broadcastable dimension reduction
  * (segment customers ≪ orders); the lineitem semi-join shuffles on
  * l_orderkey only if the build side exceeds the broadcast threshold — at
  * 100 TB, AQE picks broadcast for the filtered order-key set per partition
  * stats. The aggregate is partial+final hash agg (map-side combine), so the
  * only full-width shuffle is the group-by on one low-cardinality key.
  */
object Flagship {

  def flagship(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    import spark.implicits._

    val buildingCustomers = t.customer
      .filter($"c_mktsegment" === "BUILDING")     // P4
      .select($"c_custkey")                       // P11 (key projection)

    val segmentOrders = t.orders
      .join(buildingCustomers, $"o_custkey" === $"c_custkey", "left_semi") // J1
      .select($"o_orderkey".as("l_orderkey"))

    t.lineitem
      .join(segmentOrders, Seq("l_orderkey"), "left_semi") // J1 (2nd hop)
      .groupBy($"l_linestatus")                            // A7
      .agg(
        count(lit(1)).as("n_items"),                            // A5
        countIf($"l_returnflag" === "R").as("n_returned"),      // A5
        countIf($"l_returnflag" === "A").as("n_flag_a"),        // A5
        dsum0($"l_extendedprice").as("revenue"),                // A6 + F10
        dsum0($"l_quantity").as("total_qty"))                   // A6
      .orderBy($"l_linestatus")
  }

  /** The reference's `GET /admin/home` + `/admin/stats`
    * (/root/reference/index.js:1200-1233, :1375-1398): role counts, coin
    * grand total, payment grand total — four independent aggregates the
    * reference runs as four sequential Mongo round-trips, here one
    * single-row plan (each aggregate is a partial+final hash agg; the
    * cross-joins are 1×1 rows). */
  def adminHome(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    import spark.implicits._
    val roleCounts = t.customer.agg(
      countIf($"c_mktsegment" === "MACHINERY").as("n_workers"),   // A1
      countIf($"c_mktsegment" === "BUILDING").as("n_buyers"))     // A1
    val coinTotal = t.customer.agg(dsum0($"c_acctbal").as("total_coins"))        // A3
    val paymentTotal = t.orders.agg(dsum0($"o_totalprice").as("total_payments")) // A3
    roleCounts.crossJoin(coinTotal).crossJoin(paymentTotal)
  }

  /** The reference's `GET /api/worker/home` (index.js:325-372, SURVEY
    * §3.2) — the N+1-join endpoint. Worker ≙ supplier: one supplier's
    * lineitems give the status counts (A5), the null-safe earnings fold
    * over approved items (A6), the balance point-read (P1/F10), and the
    * N+1 `Promise.all(findOne)` enrichment becomes one broadcast
    * left-outer join feeding a single aggregate — zero per-row round
    * trips at any scale. */
  def workerHome(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    import spark.implicits._
    val mine = t.lineitem.filter($"l_suppkey" === 3L)           // P4
    val approved = mine.filter($"l_returnflag" === "A")         // P8
    val enriched = approved
      .join(t.orders, $"l_orderkey" === $"o_orderkey", "left_outer") // J2
    val stats = mine.agg(
      count(lit(1)).as("n_total"),                              // A5
      countIf($"l_returnflag" === "R").as("n_pending"),
      countIf($"l_returnflag" === "A").as("n_approved"))
    val earnings = enriched.agg(
      dsum0(coalesce($"l_extendedprice", lit(0.0))).as("total_earned"), // A6+F10
      countIf($"o_orderkey".isNull).as("n_unknown_task"))       // J2 default path
    val coins = t.supplier.filter($"s_suppkey" === 3L)          // P1
      .agg(dsum0($"s_acctbal").as("coins"))                     // F10 (empty→0)
    stats.crossJoin(earnings).crossJoin(coins)
  }

  val workerHomeSql: String =
    s"""SELECT
       |  (SELECT count(*) FROM lineitem WHERE l_suppkey = 3) AS n_total,
       |  (SELECT count(*) FROM lineitem WHERE l_suppkey = 3 AND l_returnflag = 'R') AS n_pending,
       |  (SELECT count(*) FROM lineitem WHERE l_suppkey = 3 AND l_returnflag = 'A') AS n_approved,
       |  (SELECT ${sqlDsum0("coalesce(l_extendedprice, 0.0)")} FROM lineitem
       |   WHERE l_suppkey = 3 AND l_returnflag = 'A') AS total_earned,
       |  (SELECT count(*) FROM lineitem l LEFT OUTER JOIN orders o
       |     ON l.l_orderkey = o.o_orderkey
       |   WHERE l.l_suppkey = 3 AND l.l_returnflag = 'A' AND o.o_orderkey IS NULL)
       |    AS n_unknown_task,
       |  (SELECT ${sqlDsum0("s_acctbal")} FROM supplier WHERE s_suppkey = 3) AS coins""".stripMargin

  val adminHomeSql: String =
    s"""SELECT
       |  (SELECT count(*) FROM customer WHERE c_mktsegment = 'MACHINERY') AS n_workers,
       |  (SELECT count(*) FROM customer WHERE c_mktsegment = 'BUILDING') AS n_buyers,
       |  (SELECT ${sqlDsum0("c_acctbal")} FROM customer) AS total_coins,
       |  (SELECT ${sqlDsum0("o_totalprice")} FROM orders) AS total_payments""".stripMargin

  val flagshipSql: String =
    """SELECT l_linestatus,
      |       count(*) AS n_items,
      |       count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
      |       count(*) FILTER (WHERE l_returnflag = 'A') AS n_flag_a,
      |       coalesce(cast(sum(cast(l_extendedprice as decimal(18,6))) as double), 0.0) AS revenue,
      |       coalesce(cast(sum(cast(l_quantity as decimal(18,6))) as double), 0.0) AS total_qty
      |FROM lineitem
      |WHERE l_orderkey IN (
      |  SELECT o_orderkey FROM orders
      |  WHERE o_custkey IN (
      |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'))
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin
}
