package graft

import org.scalatest.funsuite.AnyFunSuite

/** The catalog's oracle SQL is written ONCE in the shared Spark∩DuckDB
  * dialect — with `GraftExtensions`' dialect-compat spellings installed
  * (sha256, len-on-arrays, list_filter/list_transform, range, unnest,
  * epoch_us, quantile_cont, ... — see `DialectCompat`), 124 of the
  * oracle texts run VERBATIM on Spark SQL. This spec executes each via
  * spark.sql over the temp-view catalog and requires row-for-row
  * equality with the DataFrame program: one query text, three engines
  * (Spark DataFrame, Spark SQL, DuckDB), one result.
  *
  * `spark.sql.parser.escapedStringLiterals=true` is part of the parity
  * profile: the warehouse dialect treats backslashes in string literals
  * as raw regex characters ('\s+'), where Spark's default parser would
  * consume them as escapes — a silent regex rewrite, not an error.
  *
  * The 27 remaining texts use constructs with no shared spelling or
  * shared SEMANTICS to bridge: 1-based array subscripts and `a[i:j]`
  * slices (t4/t12/t13/t14, d3/d4/d9/d10/pipe2), parallel-unnest zipping (s5),
  * `[...]` list literals and `DOUBLE[]` casts (s1/s2/s7/s8/e4), recursive
  * CTEs with UNION dedup (d7), parser-level `//` integer division
  * (w10), IGNORE NULLS inside the call parens (e7, olap_gap_fill), string-unit date_diff parsed before
  * the function registry can see it (e9, f_date, olap_rolling_range), length-free VARCHAR casts and fmt-style format
  * (f_scalar), and BLOB casts (m1/m3/m4/m5). Their cross-engine check is
  * the driver's DuckDB gate.
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
    "j7_bloom_semi_join", "j8_skew_salted_join",
    "w1_insert_defaults", "w2_masked_update", "w3_balance_ledger",
    "w4_delete_rewrite", "w5_capacity_rule", "w6_scd2_intervals",
    "w7_partitioned_write", "w8_merge_upsert", "x1_json_roundtrip",
    "x2_csv_roundtrip",
    "a7_grouped_agg", "olap_rollup", "olap_cube", "olap_grouping_sets",
    "olap_distinct", "olap_count_distinct", "olap_ntile_quartiles",
    "olap_corr", "olap_regr", "olap_histogram", "olap_pivot", "olap_unpivot",
    "olap_string_agg", "olap_bool_aggregates", "olap_percentiles",
    "olap_window_suite", "olap_window_suite2", "olap_grouped_topk_udaf",
    "olap_scalar_subquery",
    "set_union", "set_intersect", "set_except",
    "tpch_q1", "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q11", "tpch_q12",
    "tpch_q13", "tpch_q14",
    "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q20",
    "tpch_q21", "tpch_q22",
    "dim_supplier_geo", "skew_salted_agg",
    "e1_json_extract", "e2_json_grouped", "e3_tumbling_window",
    "e5_session_window", "e6_latest_per_user", "e8_funnel",
    "e10_zscore_outliers", "e11_interarrival", "e12_transition_matrix",
    "e13_dau_wau",
    "t18_char_entropy", "t19_unigram_logprob", "t20_heavy_hitters",
    "t21_quality_tiers", "t22_zipf_fit", "j9_runtime_bloom_join",
    "c4_dynamic_pruning", "x3_orc_roundtrip",
    "d1_dedup_exact_groups", "d2_dedup_exact_select", "d6_dedup_normalized",
    "d8_incremental_dedup",
    "t1_token_counts", "t2_quality_score", "t3_language_id",
    "t5_quality_filter", "t6_corpus_stats", "t8_text_scrub",
    "t9_tfidf_top_terms", "t10_train_split", "t11_source_cap",
    "t15_doc_chunks", "t16_seq_packing", "t17_mixture_weights",
    "pipe1_corpus_prep",
    "f_string_suite", "f_null_semantics", "f_map_suite",
    "c1_catalog_sql", "c2_bucketed_join", "c3_catalog_view",
    "flagship_buyer_home", "flagship_admin_home", "flagship_worker_home")

  test(s"parity surface covers ${portable.size} oracle texts") {
    assert(portable.size >= 90, s"parity surface shrank to ${portable.size}")
    assert(portable.toSet.subsetOf(SparkEntry.oracleSql.keySet))
  }

  portable.foreach { name =>
    test(s"$name: oracle SQL runs verbatim on Spark SQL with identical results") {
      Tables(spark, dir).registerAll()
      val prev = spark.conf.get("spark.sql.parser.escapedStringLiterals")
      spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
      try {
        val viaSql = spark.sql(SparkEntry.oracleSql(name)).collect().toSeq
        val viaDf = SparkEntry.queries(name)(spark, dir).collect().toSeq
        assert(viaSql.map(_.toSeq) == viaDf.map(_.toSeq),
          s"$name: Spark SQL result differs from DataFrame result")
      } finally spark.conf.set("spark.sql.parser.escapedStringLiterals", prev)
    }
  }
}
