package graft

import org.scalatest.funsuite.AnyFunSuite

/** The catalog's oracle SQL is written in portable ANSI where possible —
  * portable enough that Spark SQL runs the SAME text DuckDB runs. For
  * every engine-portable query this spec executes the oracle SQL via
  * spark.sql over the temp-view catalog and requires row-for-row
  * equality with the DataFrame program: one query text, three engines
  * (Spark DataFrame, Spark SQL, DuckDB), one result.
  *
  * Excluded queries use engine-specific functions in the oracle
  * (DuckDB list lambdas / epoch / sha256 / json_extract_string /
  * quantile_cont / format / IGNORE-NULLS placement / BLOB casts) —
  * their cross-engine check is the driver's DuckDB gate instead.
  */
class SqlParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val portable: Seq[String] = Seq(
    "p1_point_lookup_key", "p2_point_lookup_id", "p3_conjunctive_lookup",
    "p4_filter_scan", "p5_ne_null_semantics", "p6_in_list",
    "p9_projection_rename", "s3_dynamic_scan", "o1_sort_desc_feed", "o2_topk",
    "a1_filtered_counts", "a2_compound_count", "a3_global_sum_empty0",
    "a4_filter_sum", "a5_conditional_counts", "a6_null_safe_sum",
    "j1_semi_join", "j2_enrichment_join", "j3_two_hop_chase",
    "j4_existence_check", "j5_anti_join_guard", "j6_range_band_join",
    "w1_insert_defaults", "w2_masked_update", "w3_balance_ledger",
    "w4_delete_rewrite", "w5_capacity_rule", "w6_scd2_intervals",
    "w8_merge_upsert", "j8_skew_salted_join", "olap_ntile_quartiles",
    "olap_corr", "e10_zscore_outliers",
    "olap_histogram",
    "a7_grouped_agg", "olap_rollup", "olap_cube", "olap_grouping_sets",
    "olap_distinct", "olap_count_distinct",
    "set_union", "set_intersect", "set_except",
    "olap_window_suite", "olap_grouped_topk_udaf", "olap_scalar_subquery",
    "tpch_q1", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q10", "tpch_q14",
    "tpch_q18", "tpch_q7", "tpch_q8", "tpch_q13", "tpch_q15", "tpch_q17",
    "tpch_q19", "tpch_q22", "tpch_q2", "tpch_q20", "tpch_q21",
    "olap_regr", "dim_supplier_geo", "skew_salted_agg",
    "e6_latest_per_user", "f_null_semantics",
    "flagship_buyer_home", "flagship_admin_home", "flagship_worker_home")

  portable.foreach { name =>
    test(s"$name: oracle SQL runs verbatim on Spark SQL with identical results") {
      Tables(spark, dir).registerAll()
      val viaSql = spark.sql(SparkEntry.oracleSql(name)).collect().toSeq
      val viaDf = SparkEntry.queries(name)(spark, dir).collect().toSeq
      assert(viaSql.map(_.toSeq) == viaDf.map(_.toSeq),
        s"$name: Spark SQL result differs from DataFrame result")
    }
  }
}
