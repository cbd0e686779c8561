package graft

import org.scalatest.funsuite.AnyFunSuite

/** The engine's SQL surface (SURVEY.md §7.1): every fixture registers as
  * a temp view, so each catalog query is also expressible via
  * spark.sql — Hive-style catalog semantics. These tests pin DataFrame
  * and SQL forms to identical results. */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("catalog registration exposes all ten fixture tables") {
    Tables(spark, dir).registerAll()
    val tables = spark.catalog.listTables().collect().map(_.name).toSet
    assert(Tables.names.toSet.subsetOf(tables))
  }

  test("flagship query: spark.sql form equals DataFrame form") {
    Tables(spark, dir).registerAll()
    // The oracle SQL is ANSI enough that Spark SQL runs it verbatim
    // (FILTER clause included) — one query text, two engines, one result.
    val sqlForm = spark.sql(graft.operators.Flagship.flagshipSql)
    val dfForm = SparkEntry.entry(spark)
    assert(sqlForm.collect().toSeq == dfForm.collect().toSeq)
  }

  test("external table DDL over fixture parquet: catalog metadata + queries work") {
    // Hive-style persistent-catalog surface: an EXTERNAL table whose
    // storage is the fixture parquet (no data copy), queryable and
    // describable like any warehouse table.
    spark.sql("DROP TABLE IF EXISTS ext_orders")
    spark.sql(
      s"""CREATE TABLE ext_orders USING PARQUET
         |LOCATION '$dir/orders.parquet'""".stripMargin)
    try {
      val described = spark.sql("DESCRIBE TABLE ext_orders")
        .collect().map(_.getString(0)).toSet
      assert(Set("o_orderkey", "o_totalprice", "o_orderdate").subsetOf(described))
      val n = spark.sql("SELECT count(*) AS n FROM ext_orders").head().getLong(0)
      assert(n == Tables(spark, dir).orders.count())
    } finally spark.sql("DROP TABLE IF EXISTS ext_orders") // external: data stays
  }

  test("CatalogOps registers the warehouse database once and re-points on dir change") {
    import graft.operators.CatalogOps
    CatalogOps.ensure(spark, dir)
    val tables = spark.catalog.listTables(CatalogOps.Database)
      .collect().map(_.name).toSet
    assert(Set("orders", "lineitem", "documents",
      "orders_bucketed", "customer_bucketed").subsetOf(tables))
    // External table reads the fixture in place (no copy) ...
    val viaCatalog = spark.sql(
      s"SELECT count(*) FROM ${CatalogOps.Database}.lineitem").head().getLong(0)
    assert(viaCatalog == Tables(spark, dir).lineitem.count())
    // ... and the bucketed managed table holds the same rows re-laid-out.
    val viaBucketed = spark.sql(
      s"SELECT count(*) FROM ${CatalogOps.Database}.orders_bucketed").head().getLong(0)
    assert(viaBucketed == Tables(spark, dir).orders.count())
    // Idempotent: a second ensure is memoized (no exception, same catalog).
    CatalogOps.ensure(spark, dir)
    assert(spark.catalog.listTables(CatalogOps.Database)
      .collect().map(_.name).toSet == tables)
    // Dir change A→B→A: the tables are session-global, so EVERY change
    // must re-run the DDL — including back to a dir seen before. (A
    // (session, dir)-keyed memo would silently leave the tables on B
    // after the third call.)
    val dirB = "/root/testdata/sf0.01"
    val nA = viaCatalog
    CatalogOps.ensure(spark, dirB)
    val nB = spark.sql(
      s"SELECT count(*) FROM ${CatalogOps.Database}.lineitem").head().getLong(0)
    assert(nB == Tables(spark, dirB).lineitem.count() && nB != nA)
    CatalogOps.ensure(spark, dir)
    val nBack = spark.sql(
      s"SELECT count(*) FROM ${CatalogOps.Database}.lineitem").head().getLong(0)
    assert(nBack == nA, "ensure(A) after ensure(B) must re-point back to A")
  }

  test("SQL window + join + agg over views") {
    Tables(spark, dir).registerAll()
    val out = spark.sql(
      """SELECT c_mktsegment, n, total
        |FROM (
        |  SELECT c_mktsegment, count(*) AS n,
        |         cast(sum(cast(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total,
        |         row_number() OVER (ORDER BY count(*) DESC, c_mktsegment) AS rk
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_mktsegment)
        |WHERE rk <= 3 ORDER BY n DESC, c_mktsegment""".stripMargin)
    assert(out.count() == 3)
  }
}
