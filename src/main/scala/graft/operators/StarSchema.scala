package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M4 extension — deep star-schema joins over the full dimension set
  * (region → nation → customer/supplier → orders → lineitem → part),
  * plus the skew-mitigation pattern. These exercise every fixture table
  * the core catalog doesn't.
  *
  * Scale notes:
  *   - q5/q14: dimensions (region 5 rows, nation 25, supplier, part)
  *     broadcast; the only fact-sized shuffle is the final group-by.
  *     Join ORDER matters at 100 TB: filter region first so the
  *     nation/customer build sides shrink before touching facts —
  *     written in that order, and Catalyst keeps it.
  *   - salted agg: the two-phase (salt, merge) rewrite for hot keys.
  *     A single hot group turns partial+final agg into one reducer;
  *     salting fans the hot key across SALT partitions in phase 1 and
  *     merges SALT sub-aggregates in phase 2. Result is identical to
  *     the direct group-by (its oracle) — salting is topology, not
  *     semantics. AQE's skew-join handling covers the JOIN-side analog
  *     automatically.
  */
object StarSchema extends QueryModule {


  /** TPC-H Q5-style: revenue by nation for one region-year, customer and
    * supplier in the same nation. */
  private def q5(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    t.region.filter($"r_name" === "ASIA")
      .join(t.nation, $"n_regionkey" === $"r_regionkey")
      .join(t.customer, $"c_nationkey" === $"n_nationkey")
      .join(t.orders, $"o_custkey" === $"c_custkey")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp")
        && $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
      .join(t.lineitem, $"l_orderkey" === $"o_orderkey")
      .join(t.supplier, $"l_suppkey" === $"s_suppkey"
        && $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  /** TPC-H Q14-style: promo revenue share over part×lineitem for one
    * month — a conditional-sum ratio over a broadcast join. */
  private def q14(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    val joined = t.lineitem
      .filter($"l_shipdate" >= lit("1996-03-01").cast("timestamp")
        && $"l_shipdate" < lit("1996-04-01").cast("timestamp"))
      .join(t.part, $"l_partkey" === $"p_partkey")
    // Final ratio rounded to 9 decimals: engines may differ by 1 ulp in
    // the decimal→double conversion of the sub-sums, and the division
    // amplifies it; a rounded ratio is stable across engines.
    joined.agg(
      round(lit(100.0)
        * dsum0(when($"p_type".startsWith("PROMO"),
            $"l_extendedprice" * (lit(1.0) - $"l_discount")))
        / dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 9)
        .as("promo_revenue_pct"))
  }

  /** Supplier enrichment across nation — the reference's J3 chase shape
    * on the remaining dimension chain. */
  private def suppliers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    t.supplier
      .join(t.nation, $"s_nationkey" === $"n_nationkey")
      .join(t.region, $"n_regionkey" === $"r_regionkey")
      .select($"s_suppkey", $"s_name", $"n_name".as("nation"), $"r_name".as("region"),
        $"s_acctbal")
      .orderBy($"s_suppkey")
  }

  /** TPC-H Q10-style: returned-item reporting — customers who returned
    * goods, revenue lost, joined out to nation, top 20. */
  private def q10(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    t.lineitem.filter($"l_returnflag" === "R")
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp")
        && $"o_orderdate" < lit("1996-04-01").cast("timestamp"))
      .join(t.customer, $"o_custkey" === $"c_custkey")
      .join(t.nation, $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** TPC-H Q4-style: order-priority checking — orders in a quarter with
    * at least one late-shipped lineitem (EXISTS → left-semi join with a
    * non-equi conjunct; Catalyst pushes the equi part into the hash join
    * and evaluates the date condition as a join residual). */
  private def q4(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    t.orders
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp")
        && $"o_orderdate" < lit("1996-04-01").cast("timestamp"))
      .join(t.lineitem,
        $"l_orderkey" === $"o_orderkey"
          && $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  /** Exact percentiles per group (median + p90). At 100 TB use
    * approx_percentile — same query shape, sketch-mergeable, no
    * per-group sort; the exact form is the oracle-checkable tier. */
  private def percentiles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).lineitem
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  private val Salt = 8

  /** Two-phase salted aggregation: phase 1 groups by (key, salt) —
    * spreading any hot key over `Salt` reducers — phase 2 merges the
    * sub-aggregates. Identical result to the direct group-by. */
  private def salted(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val phase1 = Tables(spark, dir).lineitem
      .withColumn("salt", pmod(xxhash64($"l_partkey", $"l_suppkey", $"l_orderkey"), lit(Salt)))
      .groupBy($"l_returnflag", $"salt")
      .agg(count(lit(1)).as("pc"), dsum($"l_quantity").as("ps"))
    phase1.groupBy($"l_returnflag")
      .agg(sum($"pc").as("n"),
        coalesce(sum($"ps"), lit(0.0)).cast("double").as("sum_qty"))
      .orderBy($"l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q4"           -> (q4 _),
    "tpch_q5"           -> (q5 _),
    "tpch_q10"          -> (q10 _),
    "tpch_q14"          -> (q14 _),
    "olap_percentiles"  -> (percentiles _),
    "dim_supplier_geo"  -> (suppliers _),
    "skew_salted_agg"   -> (salted _))

  val oracles: Map[String, String] = Map(
    "tpch_q5" ->
      s"""SELECT n_name, ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM region
         |JOIN nation ON n_regionkey = r_regionkey
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,
    "tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAYS)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "tpch_q10" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |       ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-04-01'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,
    "olap_percentiles" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.5) AS p50_qty,
        |       quantile_cont(l_quantity, 0.9) AS p90_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "tpch_q14" ->
      s"""SELECT round(100.0
         |  * ${sqlDsum0("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1.0 - l_discount) END")}
         |  / ${sqlDsum("l_extendedprice * (1.0 - l_discount)")}, 9) AS promo_revenue_pct
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
         |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,
    "dim_supplier_geo" ->
      """SELECT s_suppkey, s_name, n_name AS nation, r_name AS region, s_acctbal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY s_suppkey""".stripMargin,
    "skew_salted_agg" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |       ${sqlDsum0("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
