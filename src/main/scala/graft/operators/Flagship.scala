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
