package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M1 — read-path parity: filters, projections, predicates, sorts, top-k,
  * counts and sums (SURVEY.md §2.2, §2.4, §2.5) restated on the fixture
  * star schema.
  *
  * Reference semantics carried over (sites are /root/reference/index.js):
  *   - P1/P2 point lookups (`findOne`, e.g. :77, :137) → key-equality
  *     filter; Catalyst pushes the predicate into the parquet scan, so at
  *     100 TB this is a row-group-pruned read, not a full scan.
  *   - P5 `$ne` matches missing fields (:599-602) → null-safe
  *     `not(c <=> v)` / `IS DISTINCT FROM`, NOT plain `=!=` which drops
  *     nulls.
  *   - A3/A6 `|| 0` null-tolerance (:341, :566, :1210) → `coalesce` around
  *     sums and empty aggregates.
  *   - O2 top-k (:1239-1250) → `orderBy.limit` so Spark plans
  *     `TakeOrderedAndProject` (bounded per-partition heaps + single
  *     driver merge — no full sort at any scale).
  *
  * All constants (custkey 42, orderkey 7, segment names) exist at every
  * fixture scale factor, so the same query text is valid at sf0.001..0.1
  * and beyond.
  */
object ReadPath extends QueryModule {

  /** P1 — point lookup by the de-facto unique human key (email ≙ c_name;
    * index.js:77,120,346,...). */
  private def p1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).customer
      .filter($"c_name" === "Customer#000000042")
  }

  /** P2 — point lookup by surrogate id (`findOne({_id})`, index.js:137). */
  private def p2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).orders.filter($"o_orderkey" === 7L)
  }

  /** P3 — conjunctive-predicate lookup (ownership check, index.js:808). */
  private def p3(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).lineitem
      .filter($"l_orderkey" === 7L && $"l_linenumber" === 1)
      .orderBy($"l_partkey", $"l_suppkey")
  }

  /** P4 — equality filter scan (`find({status:'open'})`, index.js:641). */
  private def p4(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).orders
      .filter($"o_orderstatus" === "O")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  /** P5 — negation with Mongo `$ne` null semantics: `$ne` matches
    * documents where the field is missing (index.js:599-602), so the
    * Spark form is null-safe `not(<=>)`, not `=!=`. */
  private def p5(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // (l_orderkey, l_linenumber) is not unique in the fixture; include
    // l_partkey/l_suppkey for a total output order.
    Tables(spark, dir).lineitem
      .filter(!($"l_returnflag" <=> "R"))
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey", $"l_returnflag")
      .orderBy($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey")
  }

  /** P6 — IN-list predicate (status ∈ {approve, approved}, index.js:612-615). */
  private def p6(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).orders
      .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
      .select($"o_orderkey", $"o_orderpriority")
      .orderBy($"o_orderkey")
  }

  /** P9/P10/S2 — include-list projection with rename
    * (`$project {img:'$photo'}`, index.js:1243-1249, :1115). */
  private def p9(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).customer
      .select($"c_name".as("name"), $"c_acctbal".as("coins"),
        $"c_mktsegment".as("segment"))
      .orderBy($"name")
  }

  /** S3 — dynamic-predicate scan (filter applied only when the status
    * param is present, index.js:1100-1103). Shown with the param present;
    * the absent branch is the S1 full scan. */
  private def s3(spark: SparkSession, dir: String,
                 status: Option[String] = Some("P")): DataFrame = {
    import spark.implicits._
    val base = Tables(spark, dir).orders
    val filtered = status.fold(base)(s => base.filter($"o_orderstatus" === s))
    filtered.select($"o_orderkey", $"o_orderstatus").orderBy($"o_orderkey")
  }

  /** O1 — newest-first feed scan (notifications by `time` desc,
    * index.js:229-232). Tiebreak on event_id: the reference sorts on
    * non-unique (or even missing, index.js:1008) keys, which is
    * nondeterministic; a total order is the deterministic upgrade. */
  private def o1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).events
      .select($"event_id", $"ts", $"user_id", $"event_type")
      .orderBy($"ts".desc, $"event_id".desc)
  }

  /** O2 — top-k (`$sort coins desc → $limit 6 → $project`,
    * index.js:1239-1250). Plans as TakeOrderedAndProject. */
  private def o2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).customer
      .filter($"c_mktsegment" === "MACHINERY")
      .orderBy($"c_acctbal".desc, $"c_custkey".asc)
      .limit(6)
      .select($"c_name".as("name"), $"c_acctbal".as("coins"))
  }

  /** A1 — filtered counts (`countDocuments({role:'worker'})`,
    * index.js:1203-1204), both roles in one pass. */
  private def a1(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).customer.agg(
      countIf($"c_mktsegment" === "BUILDING").as("n_building"),
      countIf($"c_mktsegment" === "AUTOMOBILE").as("n_automobile"))
  }

  /** A2 — compound-predicate count with P5 null semantics
    * (`countDocuments({buyer_email, status:{$ne:'deleted'}})`,
    * index.js:599-602). */
  private def a2(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).orders
      .filter($"o_custkey" === 42L && !($"o_orderstatus" <=> "F"))
      .agg(count(lit(1)).as("n_open"))
  }

  /** A3 — global sum with empty-aggregate→0 parity (`agg[0]?.total || 0`,
    * index.js:1207-1216): one populated sum, one provably-empty sum. */
  private def a3(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables(spark, dir).customer
    c.agg(
      dsum0($"c_acctbal").as("total_coins"),
      dsum0(when($"c_mktsegment" === "NO_SUCH_SEGMENT", $"c_acctbal"))
        .as("empty_sum"))
  }

  /** A4 — filter + global sum (`$match {email} → $group $sum`,
    * index.js:562-565). */
  private def a4(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).orders
      .filter($"o_custkey" === 42L)
      .agg(dsum0($"o_totalprice").as("total_paid"))
  }

  /** A5 — conditional counts over one pass (total/pending/approved,
    * index.js:335-337): one aggregate, no refetch per status. */
  private def a5(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).lineitem.agg(
      count(lit(1)).as("n_total"),
      countIf($"l_returnflag" === "R").as("n_pending"),
      countIf($"l_returnflag" === "A").as("n_approved"))
  }

  /** A6 — null-safe fold (`reduce((s,x)=>s+(x.payable_amount||0))`,
    * index.js:340-343) → sum over coalesced values, empty→0. */
  private def a6(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, dir).lineitem
      .filter($"l_returnflag" === "A")
      .agg(dsum0(coalesce($"l_extendedprice", lit(0.0))).as("total_earned"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_point_lookup_key"   -> (p1 _),
    "p2_point_lookup_id"    -> (p2 _),
    "p3_conjunctive_lookup" -> (p3 _),
    "p4_filter_scan"        -> (p4 _),
    "p5_ne_null_semantics"  -> (p5 _),
    "p6_in_list"            -> (p6 _),
    "p9_projection_rename"  -> (p9 _),
    "s3_dynamic_scan"       -> ((s: SparkSession, d: String) => s3(s, d)),
    "o1_sort_desc_feed"     -> (o1 _),
    "o2_topk"               -> (o2 _),
    "a1_filtered_counts"    -> (a1 _),
    "a2_compound_count"     -> (a2 _),
    "a3_global_sum_empty0"  -> (a3 _),
    "a4_filter_sum"         -> (a4 _),
    "a5_conditional_counts" -> (a5 _),
    "a6_null_safe_sum"      -> (a6 _))

  val oracles: Map[String, String] = Map(
    "p1_point_lookup_key" ->
      "SELECT * FROM customer WHERE c_name = 'Customer#000000042'",
    "p2_point_lookup_id" ->
      "SELECT * FROM orders WHERE o_orderkey = 7",
    "p3_conjunctive_lookup" ->
      """SELECT * FROM lineitem WHERE l_orderkey = 7 AND l_linenumber = 1
        |ORDER BY l_partkey, l_suppkey""".stripMargin,
    "p4_filter_scan" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'O' ORDER BY o_orderkey""".stripMargin,
    "p5_ne_null_semantics" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag
        |FROM lineitem
        |WHERE l_returnflag IS DISTINCT FROM 'R'
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,
    "p6_in_list" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |ORDER BY o_orderkey""".stripMargin,
    "p9_projection_rename" ->
      """SELECT c_name AS name, c_acctbal AS coins, c_mktsegment AS segment
        |FROM customer ORDER BY name""".stripMargin,
    "s3_dynamic_scan" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderstatus = 'P' ORDER BY o_orderkey""".stripMargin,
    "o1_sort_desc_feed" ->
      """SELECT event_id, ts, user_id, event_type FROM events
        |ORDER BY ts DESC, event_id DESC""".stripMargin,
    "o2_topk" ->
      """SELECT c_name AS name, c_acctbal AS coins FROM customer
        |WHERE c_mktsegment = 'MACHINERY'
        |ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 6""".stripMargin,
    "a1_filtered_counts" ->
      """SELECT count(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS n_building,
        |       count(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS n_automobile
        |FROM customer""".stripMargin,
    "a2_compound_count" ->
      """SELECT count(*) AS n_open FROM orders
        |WHERE o_custkey = 42 AND o_orderstatus IS DISTINCT FROM 'F'""".stripMargin,
    "a3_global_sum_empty0" ->
      s"""SELECT ${sqlDsum0("c_acctbal")} AS total_coins,
         |       ${sqlDsum0("CASE WHEN c_mktsegment = 'NO_SUCH_SEGMENT' THEN c_acctbal END")} AS empty_sum
         |FROM customer""".stripMargin,
    "a4_filter_sum" ->
      s"""SELECT ${sqlDsum0("o_totalprice")} AS total_paid
         |FROM orders WHERE o_custkey = 42""".stripMargin,
    "a5_conditional_counts" ->
      """SELECT count(*) AS n_total,
        |       count(*) FILTER (WHERE l_returnflag = 'R') AS n_pending,
        |       count(*) FILTER (WHERE l_returnflag = 'A') AS n_approved
        |FROM lineitem""".stripMargin,
    "a6_null_safe_sum" ->
      s"""SELECT ${sqlDsum0("coalesce(l_extendedprice, 0.0)")} AS total_earned
         |FROM lineitem WHERE l_returnflag = 'A'""".stripMargin)
}
