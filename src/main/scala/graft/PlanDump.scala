package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: capture formatted physical plans for headline queries into
  * PLANS.md — reviewable evidence that the plans are the ones a 100 TB
  * deployment needs (pushdown, pruning, broadcast, top-k, codegen).
  * Not part of the driver contract; run manually:
  *   sbt "runMain graft.PlanDump /root/testdata/sf0.001 PLANS.md"
  */
object PlanDump {
  private val headline = Seq(
    "flagship_buyer_home" -> "the reference's flagship endpoint: two semi-join hops + one-pass conditional aggregate",
    "tpch_q3"             -> "dimension-filtered 3-way join, grouped revenue, top-10 on the aggregate",
    "o2_topk"             -> "top-k: TakeOrderedAndProject, no global sort",
    "w5_capacity_rule"    -> "ranking window restatement of the guarded-approve mutation",
    "d4_dedup_minhash_lsh" -> "MinHash signatures, banded candidates, exact verification",
    "s1_ann_bruteforce_topk" -> "custom codegen float_dot kernel + broadcast query set",
    "e5_session_window"   -> "session windows: single shuffle on the user key",
    "d7_dup_clusters"     -> "connected-components labels joined back to the corpus (loop already converged at plan time)",
    "t9_tfidf_top_terms"  -> "tf/df aggregates + broadcast scalar N + per-doc ranking window",
    "s5_embedding_centroids" -> "posexplode to (label, dim) keys, one map-combined aggregate",
    "d3_dedup_ngram_jaccard" -> "prefix-filtered set-similarity join over kernel-hashed shingles; sorted-merge intersection verify",
    "j7_bloom_semi_join"  -> "bloom sketch as a scalar-subquery predicate at the fact scan; exact semi-join removes false positives",
    "e8_funnel"           -> "ordered funnel state machine: two window passes + per-user agg on ONE user shuffle",
    "t10_train_split"     -> "content-keyed train/val/test split: pure per-row map, zero shuffle",
    "e9_cohort_retention" -> "cohort day via user-window min: the log shuffles once, never self-joins",
    "w8_merge_upsert"     -> "batch CDC MERGE: latest-per-key reduce on each side, then one full-outer coalesce join",
    "j8_skew_salted_join" -> "hot-key salted join: build side replicated xS, fact salt from a deterministic hash",
    "d8_incremental_dedup" -> "new-batch vs corpus anti-join on content hashes — bodies never shuffle",
    "tpch_q21"            -> "multi-EXISTS/NOT-EXISTS decorrelated to equi-keyed left-semi + left-anti hash joins",
    "tpch_q2"             -> "correlated scalar-min subquery decorrelated to a per-part min window",
    "t5_quality_filter"   -> "broadcast percentile-cutpoint filter: two parallel scans, no global sort window",
    "t16_seq_packing"     -> "two-pass parallel prefix sum: bucketed local cumsums + offsets from a bucket-count aggregate",
    "c2_bucketed_join"    -> "bucketed warehouse tables: sort-merge join with zero exchange on the join keys",
    "c4_dynamic_pruning"  -> "runtime-derived dim over a partitioned fact: DynamicPruningExpression at the fact scan",
    "s6_ann_persistent_index" -> "ANN served from the persisted bucketed index: IN-filter bucket pruning + exact re-rank",
    "s8_kmeans_iteration" -> "one Lloyd pass: broadcast centroids, map-side argmin, (cell, dim)-keyed mean recompute",
    "t20_heavy_hitters"   -> "Misra-Gries sketch (O(64) state/partition) + broadcast-refined exact counts",
    "t21_quality_tiers"   -> "t19 model score + 2-value percentile scalar broadcast; tier label is a map-side CASE",
    "j9_runtime_bloom_join" -> "InjectRuntimeFilter-eligible large-x-large join (fixture scale: correct decline; see PlanSpec)",
    "d10_incremental_neardup" -> "near-dup serving from the persisted band index: batch bands broadcast, index never shuffles",
    "pipe2_incremental_ingest" -> "ingest funnel: dedup/near-dup/quality as flags folded by one aggregate over the batch",
    "olap_rolling_range" -> "time-based RANGE frame over daily pre-aggregates: moving sum stays decimal through the window",
    "t18_char_entropy"   -> "per-doc code-point histogram as a one-pass kernel: zero exchange from scan to result (r6)",
    "t23_bigram_logprob" -> "bigram LM scoring: two top-V models broadcast against the bigram stream, corpus never join-shuffled (r6)",
    "d5b_simhash_oracle" -> "md5-bit SimHash kernel + banded pigeonhole pairing (4x15-bit chunks) — the oracle-gated near-dup tier (r6)",
    "m2_media_features"  -> "real PNG/BMP/WAV/AVI encode->header-parse decode in mapPartitions batches, no shuffle (r6)",
    "s9_embedding_covariance" -> "64x64 covariance: in-task pair explode, partial aggregation caps shuffle at tasks x d(d+1)/2 rows (r6)",
    "t11_source_cap"     -> "two-level salted per-source cap: 16 parallel bounded windows + one 800-row re-cap, no hot partition (r6)",
    "d11_substring_spans" -> "ExactSubstr spans: linear k-gram occurrence join + per-doc islands merge — the suffix-array monolith re-expressed as shuffles (r6)",
    "g1_pagerank"         -> "3 PageRank supersteps in exact 1e-9-unit BIGINT: one rank-edge shuffle + one map-combined aggregate per iteration (r6)",
    "g2_bfs_hops"         -> "delta-frontier BFS: per hop one frontier-to-edge-cache join + one EXCEPT; persisted frontiers, settled nodes never re-expand (r6)",
    "g4_knn_triangles"    -> "a<b<c oriented triangle join over the mutual top-K graph — K|V|/2 edges by construction (r6)",
    "e14_attribution"     -> "first/last touch as min/max of a (us,eid,ch) struct over a 7-day RANGE frame — one log pass, no self-join (r6)",
    "t24_bpe_merges"      -> "BPE trainer: corpus touched once, 8 argmax+apply steps over the persisted vocab frame, trace returned as local rows (r6)",
    "s11_pq_adc"          -> "product quantization: integer codebook train+encode, ADC from the broadcast MxK table — fully oracle-gated ANN (r6)",
    "w11_cdc_apply"       -> "CDC op-log apply: latest-op-wins as ONE max(struct) map-combined aggregate, tombstones filtered (r6)",
    "g5_cheapest_path"    -> "hop-bounded min-plus Bellman-Ford: per round one settled-frame join + one map-combined min (r6)",
    "pipe3_train_manifest" -> "training handoff: dedup -> content split -> token/sequence accounting, stream-pack count as ceiling division (r6)",
    "s12_ann_ivf_adc"     -> "IVF-ADC: queries probe 2 coarse cells, score residual-PQ codes from broadcast per-cell tables; index served from checkpoint blocks (r7)",
    "e13_dau_wau"         -> "DAU/WAU from one deduped (day,user) frame feeding three subtrees; WAU via a broadcast 7-day range join, log never self-joins (r7)",
    "d13_semantic_dedup"  -> "SemDeDup: adaptive-k centroid broadcast argmax, ONE cell shuffle, pair space bounded inside ~250-row cells (r7)",
    "t29_cdc_chunks"      -> "content-defined chunking: in-task window hashes, per-doc boundary prefix sum, position-sorted chunk roll-up (r7)",
    "w12_incremental_rollup" -> "incremental view maintenance: checkpointed base rollup + map-combined delta contributions, base never rescanned (r7)",
    "t28_mixture_resample" -> "mixture apply-step: |sources|-row factor frame broadcast, one corpus map pass, content-keyed fractional epochs (r7)",
    "m6_perceptual_neardup" -> "visual dedup: real PNG/BMP pixel decode in mapPartitions, 60-bit grid aHash, banded Hamming pairing — no corpus self-join (r7)",
    "j11_interval_overlap" -> "fact x fact interval join as an EQUI-join on 7-day grid cells; each pair claimed once by its overlap-start cell (r7)",
    "pipe4_curation_report" -> "composite curation decision: full-corpus dedup rank + d13's served verdict artifact + token gate, one summary aggregate (r7)",
    "g6_label_prop"       -> "synchronous LPA communities: per round one label-edge join + count + max(struct) argmax, all frames |V|-bounded (r7)",
    "g7_kcore"            -> "k-core peel in EDGE form: two window degree counts per round, single-reference linear chain (node form would unroll 2^R) (r7)",
    "t27_quality_rules"   -> "Gopher rule battery: one (doc,word) frequency-profile aggregate, exchanges carry profiles, never the token stream (r7)",
    "w13_time_travel"     -> "AS-OF reads over the CDC log: in-task visibility fanout + ONE map-combined latest-op-wins keyed (version, key) (r7)",
    "w14_dynamic_overwrite" -> "dynamic partition overwrite: the en slice rewrite plans only the incoming frame; sibling partitions untouched (r7)",
    "pipe5_data_audit"    -> "constraint report: per-table conditional aggregates unpivoted via stack(); RI walks ride existing joins (r7)",
    "m7_audio_features"   -> "real WAV PCM decode in mapPartitions: per-channel peak/energy folded in-task, payloads never shuffle (r7)",
    "e15_count_anomaly"   -> "trailing-window z-test cleared of division: BIGINT moments over ROWS BETWEEN frames, no float anywhere (r7)",
    "j12_asof_join"       -> "general as-of kernel: union-tagged streams + one per-key window, ZERO Join nodes, |L|+|R| rows moved (r7)",
    "t30_bm25"            -> "BM25 retrieval: explode->aggregate carries only query-term rows; df and corpus stats broadcast; rank cut top-10 (r7)",
    "s14_hard_negatives"  -> "hard-negative mining: one broadcast cosine pass, best-positive via window max, wrong-label top-5 + margin (r7)",
    "e16_session_paths"   -> "gaps-and-islands sessionization + sort-key-packed path assembly: lag/runsum windows share ONE user shuffle (r7)",
    "s15_retrieval_metrics" -> "nDCG/MRR/recall eval: one ranking pass, per-query conditional aggregates, ideal-DCG via bounded in-task fanout (r7)",
    "s16_mmr_rerank"      -> "MMR re-rank: 5 argmax+update rounds, EACH round's pick/state its own checkpointed leaf (lazy stacking re-evaluated 2^K windows — was the catalog's slowest query; now linear, corpus touched once) (r10)",
    "pipe6_hybrid_rrf"    -> "hybrid RRF fusion: both legs rank-cut to 50 BEFORE a full-outer fusion join bounded 50x50 at any corpus size (r7)",
    "d14_containment"     -> "directed containment dedup: contained-side prefix filter + unprefixed container side, sorted-merge verify (r7)",
    "g8_link_predict"     -> "link prediction: one wedge join K^2|V|-bounded by the mutual graph's degree cap, anti-join vs existing edges (r7)",
    "x7_xml_roundtrip"    -> "native XML sink+source round-trip: rowTag-split parallel scan, schema-hinted typed read-back (r7)",
    "e17_rfm_segments"    -> "RFM segmentation: per-user rollup, broadcast quartile CUTPOINTS (one percentile scalar, zero global-order windows), CASE rule table (r8)",
    "x8_variant_extract"  -> "VARIANT ingestion: heterogeneous JSON parsed to one variant column, parquet round-trip, typed variant_get extraction in the scan stage (r8)",
    "olap_sketch_rollup"  -> "mergeable-sketch rollup: persisted per-day HLL sketches, weekly distincts from hll_union_agg over the sketch table alone — raw log only in the certification leg (r8)",
    "e19_ab_test"         -> "A/B readout: one user-keyed map-combined rollup, O(1) conditional aggregate, division-free-boundary double z-verdict (r8)")

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outPath) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb ++= "# PLANS — physical-plan gallery (generated by graft.PlanDump)\n\n"
    sb ++= s"Captured against `$sfDir` with AQE on. Regenerate:\n" +
      "`sbt \"runMain graft.PlanDump /root/testdata/sf0.001 PLANS.md\"`.\n"
    headline.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize AQE so codegen ids and chosen joins are real
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      sb ++= s"\n## $name\n\n$why\n\n```\n${plan.trim}\n```\n"
    }
    Files.writeString(Paths.get(outPath), sb.toString)
    spark.stop()
  }
}
