package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M8 — the persistent-catalog surface: a warehouse database whose
  * tables are (a) EXTERNAL parquet tables registered over the fixture
  * files via `CREATE TABLE ... USING PARQUET LOCATION` (no data copy,
  * DROP never touches storage) and (b) bucketed MANAGED tables written
  * with `bucketBy(...).sortBy(...).saveAsTable` — the layout that makes
  * repeated fact-fact equi-joins shuffle-free. This is the "CREATE TABLE
  * once, query forever" surface a warehouse user expects (the reference
  * exposes named collections the same way, /root/reference/index.js:281-289);
  * per-session temp views (`Tables.registerAll`) remain the ad-hoc tier.
  *
  * Catalog persistence scope: table STORAGE (warehouse directories,
  * bucket spec in file layout) always persists; table METADATA persists
  * exactly as far as the configured catalog does — the default
  * in-memory catalog is session-lifetime, and pointing the session at a
  * Hive/Glue metastore (`enableHiveSupport`) makes the very same DDL
  * durable across sessions with zero code change here (proved by
  * `HiveCatalogSpec`: derby-backed metastore, session restart, tables
  * and the c3 view survive). Registration is idempotent and memoized
  * per session on the currently-registered dir; ANY dir change —
  * including back to a previously-seen dir — re-runs the DDL and
  * re-points the external tables.
  *
  * Scale notes: external registration is metadata-only (a footer read),
  * cost-free at any data size. The bucketed pair is written ONCE and
  * then every customer⋈orders-shaped join (c1's shape) runs with zero
  * exchange on either side — at 100 TB that is the difference between
  * re-shuffling the fact table per query and never shuffling it at all;
  * bucket count scales with cluster width (8 here for local[32]).
  */
object CatalogOps extends QueryModule {

  val Database = "graft"
  private val Buckets = 8

  /** Fixture tables registered as external catalog tables. `events` is
    * excluded: its TIMESTAMP(NANOS) physical type needs the session-conf
    * narrowing in `Tables.events`, which a bare catalog scan bypasses. */
  private val ExternalNames =
    Tables.names.filterNot(_ == "events")

  /** The dir the session's graft.* tables currently point at. The
    * catalog tables are session-GLOBAL, so the memo key must be the
    * session alone: keying on (session, dir) would make
    * ensure(A); ensure(B); ensure(A) a silent no-op on the third call,
    * leaving the tables reading B's data while the caller thinks they
    * read A's. Any dir change — including back to a previously-seen
    * dir — re-runs the DDL. */
  private val registered =
    scala.collection.concurrent.TrieMap.empty[SparkSession, String]

  /** Idempotent database + table registration. Memoized per session on
    * the CURRENTLY-registered dir; any dir change re-points the tables. */
  def ensure(spark: SparkSession, dir: String): Unit =
    registered.synchronized {
      if (!registered.get(spark).contains(dir)) {
        spark.sql(s"CREATE DATABASE IF NOT EXISTS $Database")
        ExternalNames.foreach { n =>
          spark.sql(s"DROP TABLE IF EXISTS $Database.$n")
          spark.sql(
            s"""CREATE TABLE $Database.$n USING PARQUET
               |LOCATION '$dir/$n.parquet'""".stripMargin)
        }
        Seq("orders_bucketed", "customer_bucketed", "documents_part")
          .foreach(clearOrphan(spark, _))
        Tables(spark, dir).orders.write
          .bucketBy(Buckets, "o_custkey").sortBy("o_custkey")
          .mode("overwrite").saveAsTable(s"$Database.orders_bucketed")
        Tables(spark, dir).customer.write
          .bucketBy(Buckets, "c_custkey").sortBy("c_custkey")
          .mode("overwrite").saveAsTable(s"$Database.customer_bucketed")
        // Hive-style lang-partitioned corpus copy: the layout that turns
        // partition-column predicates — static OR runtime-discovered
        // (c4's dynamic pruning) — into directory-level skipping.
        Tables(spark, dir).documents.write
          .partitionBy("lang")
          .mode("overwrite").saveAsTable(s"$Database.documents_part")
        registered.update(spark, dir)
      }
    }

  /** A managed-table location can outlive its in-memory catalog entry
    * (new session, files on disk): saveAsTable would then refuse with
    * LOCATION_ALREADY_EXISTS. Storage for a table the catalog has no
    * record of is orphaned — clear it before the overwrite. (Shared
    * with Similarity's persistent ANN index build.) */
  private[operators] def clearOrphan(spark: SparkSession, table: String): Unit =
    if (!spark.catalog.tableExists(s"$Database.$table")) {
      // Hadoop FileSystem API, not java.io.File: the warehouse dir is a
      // URI (file:, hdfs:, s3a:) and this must work on all of them.
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val p = new org.apache.hadoop.fs.Path(s"$wh/$Database.db/$table")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) { fs.delete(p, true); () }
    }

  /** c1 — order accounting THROUGH the persistent catalog: plain SQL
    * over the external tables, exactly what a warehouse user types
    * after the one-time registration. */
  private def c1(spark: SparkSession, dir: String): DataFrame = {
    ensure(spark, dir)
    spark.sql(
      s"""SELECT o_orderstatus, count(*) AS n,
         |       ${sqlDsum("o_totalprice")} AS total
         |FROM $Database.orders
         |GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin)
  }

  /** c2 — the bucketed co-located join: customer⋈orders on the shared
    * bucket key with a merge hint (the broadcast path would hide the
    * bucket layout at fixture scale; at warehouse scale SMJ is what
    * runs). Neither side re-shuffles — `PlanSpec` pins the absence of
    * an exchange on the join keys. */
  private def c2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ensure(spark, dir)
    spark.table(s"$Database.orders_bucketed")
      .hint("merge")
      .join(spark.table(s"$Database.customer_bucketed"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      .orderBy($"c_mktsegment")
  }

  /** c3 — a persistent VIEW in the warehouse database: business logic
    * (revenue by supplier nation) defined ONCE in DDL over the external
    * tables, then queried like any table. Views are catalog metadata —
    * same persistence scope as the tables (session-lifetime on the
    * in-memory catalog, durable on a metastore), zero storage. */
  private def c3(spark: SparkSession, dir: String): DataFrame = {
    ensure(spark, dir)
    spark.sql(
      s"""CREATE OR REPLACE VIEW $Database.revenue_by_nation AS
         |SELECT n_name AS nation,
         |       ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM $Database.lineitem
         |JOIN $Database.supplier ON l_suppkey = s_suppkey
         |JOIN $Database.nation ON s_nationkey = n_nationkey
         |GROUP BY n_name""".stripMargin)
    spark.sql(
      s"SELECT nation, revenue FROM $Database.revenue_by_nation ORDER BY nation")
  }

  /** c4 — DYNAMIC PARTITION PRUNING through the warehouse: the corpus
    * stored lang-partitioned (`documents_part`), joined on its partition
    * column against a dim that only exists at runtime — the languages
    * holding > 20 % corpus share (exactly `en` on this corpus's ~40/15
    * split, at every SF). No static filter on `lang` exists anywhere in
    * the query, so partition pruning is impossible at plan time;
    * Catalyst instead plants a DynamicPruningExpression on the fact
    * scan that reuses the dim's broadcast — the fact side then opens
    * ONLY the surviving partition directories. `PlanSpec` pins the
    * `dynamicpruning` filter in the executed plan. At 100 TB this is
    * the difference between scanning one language and scanning the
    * whole corpus store every time the selector is data-dependent
    * (dim-filtered fact joins are the most common warehouse query
    * shape there is). */
  private def c4(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ensure(spark, dir)
    // Share via a window over the AGGREGATED per-lang counts (|langs|
    // rows — a global window here is fine; the catalog-wide PlanSpec
    // walk only forbids them over unaggregated input). Deliberately NOT
    // a scalar-aggregate cross join: the optimizer folds that filter
    // into a join CONDITION, and DPP's selective-predicate detection
    // only fires on a residual Filter node.
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val sel = Tables(spark, dir).documents
      .groupBy($"lang").agg(count(lit(1)).as("n"))
      .withColumn("n_total", sum($"n").over(w))
      .filter($"n" > $"n_total" * 0.2)
      .select($"lang")
    spark.table(s"$Database.documents_part")
      .join(broadcast(sel), Seq("lang"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
      .orderBy($"lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c1_catalog_sql"     -> (c1 _),
    "c2_bucketed_join"   -> (c2 _),
    "c3_catalog_view"    -> (c3 _),
    "c4_dynamic_pruning" -> (c4 _))

  val oracles: Map[String, String] = Map(
    "c1_catalog_sql" ->
      s"""SELECT o_orderstatus, count(*) AS n,
         |       ${sqlDsum("o_totalprice")} AS total
         |FROM orders
         |GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin,
    "c2_bucketed_join" ->
      s"""SELECT c_mktsegment, count(*) AS n,
         |       ${sqlDsum("o_totalprice")} AS total
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin,
    "c3_catalog_view" ->
      s"""SELECT n_name AS nation,
         |       ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY n_name
         |ORDER BY nation""".stripMargin,
    // The partitioned layout is storage strategy, not semantics: the
    // oracle joins the runtime-derived language dim on the source table.
    "c4_dynamic_pruning" ->
      """WITH sel AS (
        |  SELECT lang FROM documents GROUP BY lang
        |  HAVING count(*) > 0.2 * (SELECT count(*) FROM documents))
        |SELECT d.lang,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents d JOIN sel USING (lang)
        |GROUP BY d.lang
        |ORDER BY lang""".stripMargin)
}
