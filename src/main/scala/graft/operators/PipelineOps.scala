package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M6 (continued) — the training-data curation steps downstream of
  * quality filtering and dedup: benchmark decontamination, document
  * chunking, sequence packing, and source-mixture weighting, plus the
  * block-granular exact-substring dedup signal. Together with
  * TextAnalysis/Dedup these complete the corpus-prep surface a
  * pretraining pipeline runs end to end.
  *
  * Everything is native Catalyst (no UDFs); shared tokenization comes
  * from TextAnalysis.words/ngrams, which already encode the
  * projection-discipline and short-doc guards (see `ngrams` scaladoc).
  */
object PipelineOps extends QueryModule {
  import TextAnalysis.words

  /** t14 — benchmark decontamination: flag training docs sharing any
    * distinct word 5-gram with the held-out evaluation set (the
    * GPT-3/PaLM-style n-gram-collision decontamination rule). The eval
    * set here is the deterministic `doc_id % 10 = 7` slice standing in
    * for a benchmark suite. Eval n-gram sets are benchmark-sized
    * (MBs, not TBs), so the join side is broadcast: contamination
    * checking runs at train-scan speed with ZERO shuffle of the
    * training corpus at 100 TB. Joins on the raw gram string so both
    * engines compute identical sets; a production run would join on
    * xxhash64(gram) to shrink the broadcast (collisions only
    * over-flag, which is the safe direction for decontamination). */
  /** The per-doc DISTINCT word-5-gram stream as a COMPILED per-partition
    * closure (r13; the t4/t23 precedent): the expression form —
    * `explode(array_distinct(ngrams(w, 5)))` — evaluates the ngram
    * lambda per element OUTSIDE whole-stage codegen (five element_at +
    * concat_ws per gram, interpreted), and the 100× probe read t14 at
    * 8.3 s with that construction as the per-row kernel on BOTH join
    * branches. Same tokenizer twin as t4/t23; docs under 5 words emit
    * nothing (the `when(size >= n)` guard's behavior); LinkedHashSet
    * reproduces array_distinct's per-doc dedup (row ORDER is irrelevant
    * downstream: a distinct and a semi-join). Equivalence spec-pinned
    * (T23BigramEquivalenceSpec's sibling test). The doc_id slice filters
    * are applied BELOW the closure by construction — an opaque
    * mapPartitions would otherwise defeat the scan-level pushdown the
    * old form got from the optimizer. */
  private[graft] def t14GramsKernelForTest(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else {
            val w = text.split("\\s+").filter(_.nonEmpty)
            if (w.length < 5) Iterator.empty
            else {
              val seen = new java.util.LinkedHashSet[String]()
              var i = 0
              while (i + 4 < w.length) {
                val sb = new java.lang.StringBuilder(w(i))
                var k = 1
                while (k < 5) { sb.append(' ').append(w(i + k)); k += 1 }
                seen.add(sb.toString): Unit
                i += 1
              }
              scala.jdk.CollectionConverters.IteratorHasAsScala(seen.iterator())
                .asScala.map(g => (id, g))
            }
          }
        }
      }.toDF("doc_id", "gram")
  }

  private def t14(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, dir).documents
    val evalGrams = t14GramsKernelForTest(docs.filter($"doc_id" % 10 === 7))
      .select($"gram").distinct()
    t14GramsKernelForTest(docs.filter($"doc_id" % 10 =!= 7))
      .join(broadcast(evalGrams), Seq("gram"), "left_semi")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_contaminated_grams"))
      .orderBy($"doc_id")
  }

  /** t15 — document chunking: fixed 512-char windows on a 384-char
    * stride (128-char overlap) — the context-window preparation step
    * for embedding/retrieval pipelines. Pure per-row explode of an
    * index sequence + substring: no shuffle, output volume bounded at
    * len/stride chunks per doc, parallel per document at any corpus
    * size. The `when(len > 0)` guard keeps empty docs from leaking a
    * spurious chunk via sequence's negative-step default (m3's trap). */
  private def t15(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val len = length($"text").cast("long")
    val nChunks = floor((len - 1).cast("double") / 384.0).cast("long") + 1L
    val idxs = when(len > 0, sequence(lit(0L), nChunks - 1))
      .otherwise(array().cast("array<bigint>"))
    Tables(spark, dir).documents
      .select($"doc_id", $"text", explode(idxs).as("chunk_idx"))
      .select($"doc_id", $"chunk_idx",
        ($"chunk_idx" * 384 + 1).as("start_pos"),
        $"text".substr(($"chunk_idx" * 384 + 1).cast("int"), lit(512)).as("chunk"))
      .select($"doc_id", $"chunk_idx", $"start_pos",
        length($"chunk").cast("long").as("chunk_len"),
        md5($"chunk").as("chunk_hash"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  /** t16 — sequence packing: the concat-and-split batching step of a
    * pretraining run (concatenate docs in a fixed order, cut every
    * 1024 tokens; a doc belongs to the pack holding its first token).
    * The running token sum is the one sequential dependency in the
    * whole corpus-prep pipeline, so it is computed in the standard
    * TWO-PASS parallel-prefix form, never as a global-order window
    * (whose empty partition spec plans a single-task sort of the whole
    * corpus): docs bucket by doc_id range (a pure function of the key,
    * so every branch derives identical buckets); pass 1 is a
    * PARTITIONED running sum within each bucket; pass 2 aggregates one
    * subtotal row per bucket and prefix-sums THOSE into bucket start
    * offsets — the only global-ordered operation runs over the
    * bucket-count-sized aggregate, not the corpus. Offsets broadcast
    * back; cum = offset + local_cum exactly. The bucket COUNT is a
    * constant (`PackSplitBuckets` = 4096 ≈ task count via
    * `width_bucket` over the min/max doc_id span — a broadcast-scalar
    * second scan, t5's discipline), so the offset frame is STATICALLY
    * bounded — the earlier fixed-WIDTH split (doc_id/64) made it
    * entity-proportional, the exact class the catalog-wide window walk
    * now rejects. Per-bucket mass grows with the corpus instead; the
    * pass-1 running sum stays a partitioned (distributed, spillable)
    * sort, and a 100 TB deployment raises the constant or recurses the
    * offset pass once more. The global cumsum is split-invariant for
    * any doc_id-monotone bucketing, so results are bit-identical to
    * the old split (spec-pinned against the global-window replay).
    * Division is done in doubles (exact: token counts ≪ 2^53) so both
    * engines floor identically. */
  private val PackSplitBuckets = 4096

  private def t16(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir).documents
      .select($"doc_id", size(words($"text")).cast("long").as("n_tok"))
    val span = docs.agg(min($"doc_id").as("dlo"), (max($"doc_id") + 1).as("dhi"))
    val local = docs.crossJoin(broadcast(span))
      .select($"doc_id", $"n_tok",
        width_bucket($"doc_id", $"dlo", $"dhi", lit(PackSplitBuckets)).as("bkt"))
      .withColumn("local_cum", sum($"n_tok").over(
        Window.partitionBy($"bkt").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = local.groupBy($"bkt").agg(sum($"n_tok").as("subtotal"))
      .withColumn("offset", coalesce(sum($"subtotal").over(
        Window.orderBy($"bkt").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"bkt", $"offset")
    local.join(broadcast(offsets), Seq("bkt"))
      .select($"doc_id", $"n_tok",
        floor(($"offset" + $"local_cum" - $"n_tok").cast("double") / 1024.0)
          .cast("long").as("pack_id"))
      .groupBy($"pack_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"pack_id")
  }

  /** t17 — source-mixture weighting: temperature-scaled sampling
    * weights per source, w_s ∝ n_tokens_s^α at α = 0.5 (the
    * multilingual/multi-source rebalancing rule from the mT5/XLM-R
    * family). α = 0.5 is sqrt, which IEEE-754 requires to be correctly
    * rounded — so both engines agree bitwise where an arbitrary
    * pow(x, α) would be implementation-defined. The rounded weights
    * are summed as exact decimals (order-insensitive), and each ratio
    * is a fixed order of IEEE ops rounded to 6 decimals. One tiny
    * aggregate (rows = #sources) after a map-combined token count:
    * scan-bound at any corpus size. `oversample_factor` is the
    * epoch-multiplicity a uniform-token sampler must apply per source
    * to realize the mixture. */
  private def t17(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    Tables(spark, dir).documents
      .select($"source", size(words($"text")).cast("long").as("n_tok"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
      .withColumn("w_raw",
        round(sqrt($"n_tokens".cast("double")), 6).cast("decimal(18,6)"))
      .withColumn("weight",
        round($"w_raw".cast("double")
          / sum($"w_raw").over(all).cast("double"), 6))
      .withColumn("oversample_factor",
        // Guard: a source whose docs are all empty has n_tokens = 0 and
        // would emit 0*total/0 = NaN, whose division semantics differ
        // across DuckDB builds; pin the factor to 0 on both engines.
        when($"n_tokens" > 0,
          round($"weight" * sum($"n_tokens").over(all).cast("double")
            / $"n_tokens".cast("double"), 6))
          .otherwise(lit(0.0)))
      .select($"source", $"n_docs", $"n_tokens", $"weight", $"oversample_factor")
      .orderBy($"source")
  }

  /** t28 — mixture RESAMPLING: the apply-step between t17 (which
    * computes per-source oversample factors) and t16 (which packs the
    * resulting stream) — materialize the temperature-balanced corpus as
    * an explicit (doc, copy) manifest. Each doc gets floor(f) whole
    * copies plus one more iff its CONTENT-KEYED hash fraction falls
    * below frac(f) — t10's md5-bucket principle applied to fractional
    * epochs, so the realized token share of every source converges to
    * t17's weight with zero RNG state: reproducible across engines,
    * reruns, and repartitioning, and exact duplicates resample
    * identically by construction. Factors < 1 downsample (0-or-1
    * copies), factors > 1 oversample — both arise from one rule.
    *
    * The hash fraction is the first 6 md5 hex digits as a 24-bit
    * integer over 2²⁴ — exactly representable in double on both
    * engines, and frac(f) = f − floor(f) is one exact IEEE subtraction
    * of a rounded-6 factor, so the `<` decision is deterministic
    * everywhere.
    *
    * Scale notes (100 TB): the factor frame is |sources| rows —
    * broadcast; the corpus is touched in ONE map pass (hash, compare,
    * explode) with no shuffle anywhere; output volume is the designed
    * Σ f_s·n_s manifest, each row a (doc_id, copy) pointer rather than
    * a duplicated body. */
  private def t28(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fac = t17(spark, dir).select($"source", $"oversample_factor".as("f"))
    val frac = conv(substring(md5($"text"), 1, 6), 16, 10).cast("double") /
      lit((1 << 24).toDouble)
    val nCopies = (floor($"f").cast("long") +
      when(frac < $"f" - floor($"f"), 1L).otherwise(0L)).as("n_copies")
    // Plain sort on purpose (sortedOnce tried and reverted): the copy
    // explode AMPLIFIES rows and the per-row work is one md5 draw —
    // re-running it for the sort's bounds sampling is cheaper than
    // storing the amplified frame (the helper's width rule).
    Tables(spark, dir).documents
      .join(broadcast(fac), Seq("source"))
      .select($"doc_id", $"source", nCopies)
      .select($"doc_id", $"source",
        explode(when($"n_copies" > 0, sequence(lit(1L), $"n_copies"))
          .otherwise(array().cast("array<bigint>"))).as("copy"))
      .orderBy($"doc_id", $"copy")
  }

  /** t29 — CONTENT-DEFINED chunking (the LBFS rule — Muthitacharoen
    * et al., SOSP 2001; the chunking under rsync-style dedup stores
    * and modern data-prep near-dup pipelines): a chunk boundary falls
    * AFTER token i exactly when the hash of the trailing 4-token
    * window lands in 1/16 of hash space (last md5 hex digit '0'), so
    * boundaries are a function of LOCAL CONTENT only. Contrast t15's
    * fixed 512-char windows: inserting one word early in a doc shifts
    * every downstream fixed window (every chunk hash changes — dedup
    * against the previous snapshot finds nothing), while here all
    * boundaries more than a window past the edit re-synchronize and
    * the unchanged tail chunks hash identically — THE property that
    * makes chunk-level dedup incremental. Expected chunk length is
    * geometric with mean 16 tokens.
    *
    * Shape is d11's proven kernel: window hashes are built IN-TASK
    * (slice on the carried token array at explode time, md5 in
    * codegen), the boundary prefix-sum is a PER-DOC window — one
    * doc_id-keyed shuffle of (pos, token, flag) rows, never a global
    * sort — and the chunk roll-up is a map-combined (doc, chunk)
    * aggregate whose chunk hash comes from an array_sort'd
    * collect_list (position-sorted: deterministic on any engine).
    * Scale: O(total tokens) shuffle volume, boundaries embarrassingly
    * parallel, no doc ever compares to another. */
  /** r13: the whole chunking is PER-DOC sequential logic (the cut flag
    * at position p depends on that doc's tokens p-3..p alone; the
    * prefix sum and the chunk roll-up never cross documents), so the
    * posexplode → Θ(tokens) doc-keyed window SHUFFLE → collect_list
    * aggregate it was spelled as exists only to express in-row
    * iteration — the t4 class. Now a COMPILED per-partition closure:
    * scan → chunk rows, ZERO shuffle before the presentation sort
    * (100× probe: 8.5 s → see OPTIMIZATION_r13.md). Twin semantics,
    * spec-pinned (T29CdcEquivalenceSpec) against the windowed form:
    * words() tokenizer twin, MessageDigest-MD5 hex == Spark md5()
    * (t4's argument), cut = (p0 ≥ 3 ∧ md5(4 tokens ending at p0) ends
    * in '0'), a cut row CLOSES its chunk (the preceding-rows-only
    * prefix sum), chunk hash = md5 of the chunk's tokens joined by
    * single spaces in position order. sortedOnce: the md5-per-token
    * kernel is the presentation sort's direct child. */
  private[graft] def t29KernelForTest(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hexDigits = "0123456789abcdef".toCharArray
        def md5hex(s: String): String = {
          md.reset()
          val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val out = new Array[Char](32)
          var i = 0
          while (i < 16) {
            out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
            out(2 * i + 1) = hexDigits(d(i) & 0xf)
            i += 1
          }
          new String(out)
        }
        it.flatMap { case (id, text) =>
          val w = if (text == null) Array.empty[String]
            else text.split("\\s+").filter(_.nonEmpty)
          if (w.isEmpty) Iterator.empty
          else {
            val chunks = scala.collection.mutable.Buffer
              .empty[(Long, Long, Long, Long, String)]
            var chunkId = 0L
            var start = 0 // 0-based index of the current chunk's first token
            var p = 0
            while (p < w.length) {
              val cut = p >= 3 &&
                md5hex(w(p - 3) + " " + w(p - 2) + " " + w(p - 1) + " " + w(p))
                  .charAt(31) == '0'
              if (cut || p == w.length - 1) {
                val toks = w.slice(start, p + 1)
                chunks += ((id, chunkId, start + 1L, toks.length.toLong,
                  md5hex(toks.mkString(" "))))
                chunkId += 1
                start = p + 1
              }
              p += 1
            }
            chunks.iterator
          }
        }
      }.toDF("doc_id", "chunk_id", "start_tok", "n_toks", "chunk_hash")
  }

  private def t29(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sortedOnce(t29KernelForTest(Tables(spark, dir).documents),
      $"doc_id", $"chunk_id")
  }

  /** pipe4 — the CURATION REPORT: the composite keep/drop decision a
    * curation run hands to its operator, integrating three independent
    * signal families over the embedded corpus — d2's exact-dup rank
    * (lowest doc_id per md5(text) survives, ranked over the FULL
    * corpus so a dup of an unembedded doc still counts), d13's
    * SEMANTIC near-dup verdict (the SemDeDup policy), and a minimum-
    * length quality gate (<20 tokens). Flags are counted independently
    * (they overlap) and `n_curated` is the conjunction — the corpus
    * that survives curation. This is the integration point the
    * pipe-family exists for: pipe1 filters, pipe2 ingests, pipe3
    * accounts splits, pipe4 decides what trains.
    *
    * Scale shape: one full-corpus window on the hash-partitioned dedup
    * key, one broadcast-size join to d13's |embedded| verdict frame,
    * one summary aggregate. d13's own cost analysis (adaptive-k cells)
    * carries over unchanged. */
  private def pipe4(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5($"text")).orderBy($"doc_id")
    val docs = Tables(spark, dir).documents
      .select($"doc_id", $"text")
      .withColumn("rn", row_number().over(w))
    val sem = Similarity.queries("d13_semantic_dedup")(spark, dir)
      .select($"vec_id".as("doc_id"), $"kept".as("sem_kept"))
    docs.join(sem, Seq("doc_id"))
      .select(
        ($"rn" > 1).as("exact_dup"),
        (!$"sem_kept").as("sem_dup"),
        (size(words($"text")) < 20).as("short_doc"))
      .agg(count(lit(1)).as("n_total"),
        countIf($"exact_dup").as("n_exact_dup"),
        countIf($"sem_dup").as("n_sem_dup"),
        countIf($"short_doc").as("n_short"),
        countIf(!$"exact_dup" && !$"sem_dup" && !$"short_doc").as("n_curated"))
  }

  /** d9 — block-granular exact-substring dedup: cut each doc's token
    * stream into consecutive 10-token blocks, hash each block, and
    * surface blocks occurring in ≥2 distinct documents — the scalable
    * approximation of suffix-array substring dedup (exact substring
    * matches ≥10 tokens long are caught at block alignment; halving
    * the block size tightens the bound). Per-row array math to blocks,
    * then ONE map-combined aggregate keyed by 128-bit block hash; no
    * doc bodies ever shuffle. This is the within-corpus complement of
    * d6's whole-doc normalization dedup and t13's within-doc
    * repetition ratio. */
  private def d9(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val nBlocks = ceil(size($"w").cast("double") / 10.0).cast("long")
    val blocks = when(size($"w") > 0,
        transform(sequence(lit(0L), nBlocks - 1),
          b => md5(concat_ws(" ", slice($"w", (b * 10 + 1).cast("int"), lit(10))))))
      .otherwise(array().cast("array<string>"))
    Tables(spark, dir).documents
      .select($"doc_id", words($"text").as("w"))
      .select($"doc_id", explode(blocks).as("block_hash"))
      .groupBy($"block_hash")
      .agg(countDistinct($"doc_id").as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter($"n_docs" >= 2)
      .orderBy($"block_hash")
  }

  /** pipe3 — the TRAINING MANIFEST: the summary a data-prep run hands
    * to the training job. Composes three catalog rules verbatim —
    * d2's exact dedup (lowest doc_id per md5(text) survives), t10's
    * content-keyed split (md5 bucket thresholds 'cc'/'e6' →
    * train/val/test), t1's whitespace tokens — and accounts each
    * split: docs, tokens, and 512-token packed sequences under
    * stream packing (concatenate-then-chop, the standard LLM packing;
    * n_seqs = ceil(tokens/512) needs no window at all — ceiling
    * division over the aggregate). One corpus scan, one window on the
    * hash-partitioned dedup key, one 3-group aggregate; every number
    * a BIGINT. */
  private def pipe3(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5($"text")).orderBy($"doc_id")
    val survivors = Tables(spark, dir).documents
      .select($"doc_id", $"text")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    val bucket = substring(md5($"text"), 1, 2)
    survivors.select(
        when(bucket < "cc", "train").when(bucket < "e6", "val")
          .otherwise("test").as("split"),
        size(TextAnalysis.words($"text")).cast("long").as("n_tok"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
      .select($"split", $"n_docs", $"n_tokens",
        expr("(n_tokens + 511) div 512").as("n_seqs"))
      .orderBy($"split")
  }

  /** pipe5 — the DATA-QUALITY AUDIT report (the Deequ/dbt-test class of
    * operator): named constraint checks over the warehouse — primary-key
    * uniqueness, two referential-integrity walks, domain/range bounds,
    * and a derived-column consistency check — each emitted as a
    * (check_name, metric, pass) row, where metric counts the VIOLATING
    * rows and pass is metric = 0. A 100 TB training pipeline runs
    * exactly this gate before any corpus snapshot ships; the report
    * shape (named rows, red stays visible) is the point — the fixture's
    * 122 negative account balances keep one check legitimately red so
    * the report provably reports rather than rubber-stamps.
    *
    * Scale shape: each audited table's own checks fold into ONE
    * conditional aggregate (map-combined to a single row per task),
    * unpivoted via stack() so the aggregate subtree appears in the plan
    * once per table. The two RI walks additionally read the REFERENCED
    * table's key column (a pruned one-column scan): lineitem→orders
    * joins on the key it would shuffle on anyway; customer→nation
    * broadcasts the 25-row dimension. The report is 8 rows regardless
    * of data size. */
  private def pipe5(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val t = Tables(spark, dir)
    def report(name: String, metric: Column, src: DataFrame): DataFrame =
      src.agg(metric.cast("long").as("metric"))
        .select(lit(name).as("check_name"), $"metric", ($"metric" === 0L).as("pass"))
    val liJoined = t.lineitem.select($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .join(t.orders.select($"o_orderkey").distinct(),
        $"l_orderkey" === $"o_orderkey", "left")
    // One aggregate per table, UNPIVOTED to check rows via stack():
    // the aggregate subtree (scan + join + conditional counts) appears
    // in the plan exactly once per table — a per-check union of
    // projections over the same frame would re-execute it per check.
    val li = liJoined.agg(
        countIf($"o_orderkey".isNull).cast("long").as("orphans"),
        countIf($"l_quantity" < 1 || $"l_quantity" > 50).cast("long").as("qty_bad"),
        countIf($"l_extendedprice" <= 0).cast("long").as("price_bad"))
      .select(expr("""stack(3,
          'lineitem_orders_ri', orphans,
          'lineitem_qty_bounds', qty_bad,
          'lineitem_price_positive', price_bad) AS (check_name, metric)"""))
      .select($"check_name", $"metric", ($"metric" === 0L).as("pass"))
    val cu = t.customer.join(broadcast(t.nation.select($"n_nationkey")),
        $"c_nationkey" === $"n_nationkey", "left")
      .agg(
        countIf($"n_nationkey".isNull).cast("long").as("bad_nation"),
        countIf($"c_acctbal" < 0).cast("long").as("neg_bal"))
      .select(expr("""stack(2,
          'customer_nation_ri', bad_nation,
          'customer_acctbal_nonneg', neg_bal) AS (check_name, metric)"""))
      .select($"check_name", $"metric", ($"metric" === 0L).as("pass"))
    report("orders_pk_unique",
        count(lit(1)) - countDistinct($"o_orderkey"), t.orders)
      .union(li)
      .union(cu)
      .union(report("events_type_domain",
        countIf(!$"event_type".isin("click", "view", "signup", "purchase", "error")),
        t.events))
      .union(report("documents_nchars_consistent",
        countIf($"n_chars" =!= length($"text")), t.documents))
      .orderBy($"check_name")
  }

  /** t26 — stratified deterministic sampling: exactly `SampleK` docs
    * per (lang, source) stratum, selected by CONTENT-KEYED rank
    * (md5(text), doc_id) — t10's content-keyed-split principle applied
    * to per-stratum subsampling. This is the data-mixture construction
    * primitive (build a balanced eval slice, cap a dominant stratum,
    * draw a fixed-size audit sample): reproducible on any engine, no
    * RNG state, insensitive to row order, and stable under corpus
    * append (a doc's rank only changes if earlier-keyed docs ARRIVE in
    * its stratum — never because partitioning changed).
    *
    * Scale shape: the rank-≤-K predicate over the row_number window
    * plans as a WindowGroupLimit — a per-task top-K heap BEFORE the
    * stratum shuffle, so the exchange carries ≤ tasks·K rows per
    * stratum, never the corpus; no global sort anywhere. At 100 TB the
    * shuffle volume is bounded by strata·K·tasks regardless of corpus
    * size. */
  private val SampleK = 20
  private def t26(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"lang", $"source")
      .orderBy(md5($"text"), $"doc_id")
    Tables(spark, dir).documents
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= SampleK)
      .select($"lang", $"source", $"rk", $"doc_id", md5($"text").as("key"))
      .orderBy($"lang", $"source", $"rk")
  }

  /** pipe6 — HYBRID retrieval with Reciprocal Rank Fusion (Cormack et
    * al. SIGIR 2009, the fusion every production search stack runs):
    * the lexical ranking (t30's BM25) and the vector ranking (cosine
    * to a query embedding) fused by rrf = Σ 1/(60 + rank) over each
    * leg's top-50, top-10 returned. RRF needs no score calibration —
    * only RANKS cross the fusion boundary, which is why it wins when
    * the legs' score scales are incomparable (BM25 logs vs cosines).
    *
    * The corpus is PARTIALLY embedded by fixture construction (sf0.1:
    * 5000 docs, 2000 embeddings) — exactly the migration state real
    * hybrid deployments live in — so the fusion is a FULL OUTER join
    * on doc_id: lexical-only docs keep their BM25 leg, vector-only
    * rows their cosine leg, the coalesce(…, 0.0) pinning absent legs
    * to zero contribution.
    *
    * Scale: each leg is rank-cut to 50 BEFORE fusion (TakeOrdered,
    * never a global sort); the fusion join is 50×50-row-bounded BY
    * CONSTRUCTION regardless of corpus size. Determinism: ranks are
    * integers; 1/(60+rank) and the two-term sum are fixed-order IEEE
    * ops written identically in both engines; ties (mirror-image rank
    * pairs give equal rrf) break by doc_id. */
  private def pipe6(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // Each leg's cut is orderBy+limit — TakeOrderedAndProject, the
    // DISTRIBUTED top-k (per-task heaps + one 50-row merge) — and only
    // the 50 survivors see the rank window. A bare global rank window
    // here would single-partition-sort the whole corpus (the
    // catalog-wide PlanSpec walk rejects exactly that shape).
    val wa = Window.orderBy($"score_r".desc, $"doc_id")
    val ra = TextAnalysis.bm25Scores(spark, dir)
      .orderBy($"score_r".desc, $"doc_id").limit(50)
      .withColumn("rka", row_number().over(wa).cast("long"))
      .select($"doc_id", $"rka")
    // The s-family's shared normalized corpus — ONE home for the
    // cosine discipline (registers float_dot, computes nrm once).
    val n = Similarity.corpus(spark, dir)
    // limit(1): vec_id is unique, so this is a no-op semantically, but
    // it makes the broadcast side STATICALLY bounded (the condition-
    // less-join walk's contract, like the grouping-free aggregates).
    val qv = n.filter($"vec_id" === 0)
      .select($"embedding".as("qe"), $"nrm".as("qn")).limit(1)
    val cosr = n.filter($"vec_id" =!= 0).crossJoin(broadcast(qv))
      .select($"vec_id".as("doc_id"),
        round(Similarity.dot($"qe", $"embedding") / ($"qn" * $"nrm"), 6).as("cos_r"))
    val wb = Window.orderBy($"cos_r".desc, $"doc_id")
    val rb = cosr.orderBy($"cos_r".desc, $"doc_id").limit(50)
      .withColumn("rkb", row_number().over(wb).cast("long"))
      .select($"doc_id", $"rkb")
    val fused = ra.join(rb, Seq("doc_id"), "full_outer")
      .select($"doc_id", $"rka", $"rkb",
        round(coalesce(lit(1.0) / (lit(60L) + $"rka").cast("double"), lit(0.0))
          + coalesce(lit(1.0) / (lit(60L) + $"rkb").cast("double"), lit(0.0)), 9)
          .as("rrf_r"))
    val wr = Window.orderBy($"rrf_r".desc, $"doc_id")
    fused.withColumn("rank", row_number().over(wr).cast("long"))
      .filter($"rank" <= 10)
      .select($"doc_id", $"rank", $"rka".as("bm25_rank"), $"rkb".as("cos_rank"),
        $"rrf_r")
      .orderBy($"rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe6_hybrid_rrf" -> (pipe6 _),
    "pipe5_data_audit"      -> (pipe5 _),
    "pipe4_curation_report" -> (pipe4 _),
    "t29_cdc_chunks"        -> (t29 _),
    "t28_mixture_resample"  -> (t28 _),
    "t26_stratified_sample" -> (t26 _),
    "pipe3_train_manifest" -> (pipe3 _),
    "t14_decontamination"   -> (t14 _),
    "t15_doc_chunks"        -> (t15 _),
    "t16_seq_packing"       -> (t16 _),
    "t17_mixture_weights"   -> (t17 _),
    "d9_block_dedup"        -> (d9 _))

  private val wordsSql =
    "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"

  val oracles: Map[String, String] = Map(
    // pipe6: both legs restated (BM25 via the shared CTE, cosine via
    // the s1 discipline), rank-cut, full-outer fused with the identical
    // reciprocal-rank arithmetic.
    "pipe6_hybrid_rrf" ->
      s"""WITH ${TextAnalysis.bm25SqlCte},
         |topa AS (SELECT doc_id, score_r FROM bm25
         |         ORDER BY score_r DESC, doc_id LIMIT 50),
         |ra AS (SELECT doc_id, CAST(row_number() OVER (
         |                 ORDER BY score_r DESC, doc_id) AS BIGINT) AS rka
         |       FROM topa),
         |v AS (SELECT vec_id,
         |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |      FROM embeddings),
         |nv AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM v),
         |qv AS (SELECT e AS qe, nrm AS qn FROM nv WHERE vec_id = 0 LIMIT 1),
         |cosr AS (SELECT c.vec_id AS doc_id,
         |                round(list_dot_product(qv.qe, c.e) / (qv.qn * c.nrm), 6)
         |                  AS cos_r
         |         FROM nv c CROSS JOIN qv WHERE c.vec_id <> 0),
         |topb AS (SELECT doc_id, cos_r FROM cosr
         |         ORDER BY cos_r DESC, doc_id LIMIT 50),
         |rb AS (SELECT doc_id, CAST(row_number() OVER (
         |                 ORDER BY cos_r DESC, doc_id) AS BIGINT) AS rkb
         |       FROM topb),
         |fused AS (
         |  SELECT doc_id, rka, rkb,
         |         round(coalesce(1.0 / CAST(60 + rka AS DOUBLE), 0.0)
         |               + coalesce(1.0 / CAST(60 + rkb AS DOUBLE), 0.0), 9)
         |           AS rrf_r
         |  FROM ra FULL OUTER JOIN rb USING (doc_id))
         |SELECT doc_id, rank, rka AS bm25_rank, rkb AS cos_rank, rrf_r FROM (
         |  SELECT *, CAST(row_number() OVER (ORDER BY rrf_r DESC, doc_id)
         |                 AS BIGINT) AS rank
         |  FROM fused)
         |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    // pipe5: the same per-table conditional aggregates, unpivoted via
    // UNION ALL selects off the one-row CTEs (the oracle states the
    // report, not the plan); count FILTER spells identically in both
    // engines, casts because DuckDB widens aggregates.
    "pipe5_data_audit" ->
      """WITH li AS (
        |  SELECT CAST(count(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT) AS orphans,
        |         CAST(count(*) FILTER (WHERE l.l_quantity < 1 OR l.l_quantity > 50) AS BIGINT) AS qty_bad,
        |         CAST(count(*) FILTER (WHERE l.l_extendedprice <= 0) AS BIGINT) AS price_bad
        |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON l.l_orderkey = o.o_orderkey),
        |cu AS (
        |  SELECT CAST(count(*) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT) AS bad_nation,
        |         CAST(count(*) FILTER (WHERE c.c_acctbal < 0) AS BIGINT) AS neg_bal
        |  FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey),
        |checks AS (
        |  SELECT 'orders_pk_unique' AS check_name,
        |         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS metric
        |  FROM orders
        |  UNION ALL SELECT 'lineitem_orders_ri', orphans FROM li
        |  UNION ALL SELECT 'lineitem_qty_bounds', qty_bad FROM li
        |  UNION ALL SELECT 'lineitem_price_positive', price_bad FROM li
        |  UNION ALL SELECT 'customer_nation_ri', bad_nation FROM cu
        |  UNION ALL SELECT 'customer_acctbal_nonneg', neg_bal FROM cu
        |  UNION ALL SELECT 'events_type_domain',
        |    CAST(count(*) FILTER (WHERE event_type NOT IN
        |      ('click', 'view', 'signup', 'purchase', 'error')) AS BIGINT)
        |  FROM events
        |  UNION ALL SELECT 'documents_nchars_consistent',
        |    CAST(count(*) FILTER (WHERE n_chars <> len(text)) AS BIGINT)
        |  FROM documents)
        |SELECT check_name, metric, (metric = 0) AS pass
        |FROM checks ORDER BY check_name""".stripMargin,
    // pipe4: d13's shared CTE chain (Similarity.d13SqlCte) + the
    // full-corpus dedup rank + the token gate, folded into one
    // summary row. Shared dialect: parity-surface member.
    "pipe4_curation_report" ->
      s"""${Similarity.d13SqlCte},
         |sem AS (
         |  SELECT a.vec_id, d.vec_id IS NULL AS kept
         |  FROM assigned a LEFT JOIN dom d ON a.vec_id = d.vec_id),
         |ranked AS (
         |  SELECT doc_id, text,
         |         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |  FROM documents),
         |flags AS (
         |  SELECT r.rn > 1 AS exact_dup, NOT s.kept AS sem_dup,
         |         len($wordsSql) < 20 AS short_doc
         |  FROM (SELECT doc_id, text, rn FROM ranked) r
         |  JOIN sem s ON r.doc_id = s.vec_id)
         |SELECT count(*) AS n_total,
         |       count(CASE WHEN exact_dup THEN 1 END) AS n_exact_dup,
         |       count(CASE WHEN sem_dup THEN 1 END) AS n_sem_dup,
         |       count(CASE WHEN short_doc THEN 1 END) AS n_short,
         |       count(CASE WHEN NOT exact_dup AND NOT sem_dup AND NOT short_doc
         |             THEN 1 END) AS n_curated
         |FROM flags""".stripMargin,
    // t29: same window-hash boundary rule, prefix-sum islands, and
    // position-ordered chunk hash — DuckDB spells the ordered concat
    // as string_agg(... ORDER BY i), Spark as a position-sorted
    // collect_list; identical strings, identical md5.
    "t29_cdc_chunks" ->
      s"""WITH toks AS (
         |  SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i
         |  FROM (SELECT doc_id, $wordsSql AS w FROM documents)
         |  WHERE len(w) > 0),
         |flagged AS (
         |  SELECT doc_id, i, w[CAST(i AS INTEGER)] AS tok,
         |         CASE WHEN i >= 4 AND substr(md5(array_to_string(
         |                list_slice(w, i - 3, i), ' ')), 32, 1) = '0'
         |              THEN 1 ELSE 0 END AS cut
         |  FROM toks),
         |chunked AS (
         |  SELECT doc_id, i, tok,
         |         CAST(coalesce(sum(cut) OVER (
         |                PARTITION BY doc_id ORDER BY i
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |              0) AS BIGINT) AS chunk_id
         |  FROM flagged)
         |SELECT doc_id, chunk_id, min(i) AS start_tok,
         |       count(*) AS n_toks,
         |       md5(string_agg(tok, ' ' ORDER BY i)) AS chunk_hash
         |FROM chunked GROUP BY doc_id, chunk_id
         |ORDER BY doc_id, chunk_id""".stripMargin,
    // t28: t17's factor CTE + the content-keyed fractional-epoch rule.
    // The 24-bit hash fraction is spelled digit-by-digit via instr
    // (d5b's hex idiom); every term and the sum are exact in double,
    // and /2^24 is a power-of-two division — both engines compare the
    // identical doubles. Copies come from DuckDB's end-exclusive
    // range(1, n+1); n = 0 ranges are empty, dropping the doc.
    "t28_mixture_resample" -> {
      val hex6 = (1 to 6).map { i =>
        val w = math.pow(16, 6 - i).toLong
        s"(instr('0123456789abcdef', substr(md5(d.text), $i, 1)) - 1) * $w.0"
      }.mkString("(", "\n           + ", ")")
      s"""WITH src AS (
         |  SELECT source, count(*) AS n_docs,
         |         CAST(sum(len($wordsSql)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |weighted AS (
         |  SELECT *, CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 6) AS DECIMAL(18,6))
         |              AS w_raw
         |  FROM src),
         |fac AS (
         |  SELECT source,
         |         CASE WHEN n_tokens > 0 THEN
         |           round(round(CAST(w_raw AS DOUBLE)
         |                       / CAST(sum(w_raw) OVER () AS DOUBLE), 6)
         |                 * CAST(sum(n_tokens) OVER () AS DOUBLE)
         |                 / CAST(n_tokens AS DOUBLE), 6)
         |         ELSE 0.0 END AS f
         |  FROM weighted),
         |docs AS (
         |  SELECT d.doc_id, d.source,
         |         CAST(floor(f) AS BIGINT)
         |         + CASE WHEN $hex6 / 16777216.0 < f - floor(f)
         |                THEN 1 ELSE 0 END AS n_copies
         |  FROM documents d JOIN fac USING (source))
         |SELECT doc_id, source, CAST(copy AS BIGINT) AS copy
         |FROM (SELECT doc_id, source, unnest(range(1, n_copies + 1)) AS copy
         |      FROM docs) e
         |ORDER BY doc_id, copy""".stripMargin
    },
    // t26: the same content-keyed per-stratum rank, verbatim shared
    // dialect (row_number/md5/CAST all shared) — parity-surface member.
    "t26_stratified_sample" ->
      s"""SELECT lang, source, rk, doc_id, key FROM (
         |  SELECT lang, source, doc_id, md5(text) AS key,
         |         CAST(row_number() OVER (PARTITION BY lang, source
         |                                 ORDER BY md5(text), doc_id) AS BIGINT) AS rk
         |  FROM documents) s
         |WHERE rk <= $SampleK
         |ORDER BY lang, source, rk""".stripMargin,
    // pipe3: d2's dedup rule + t10's split rule + t1's tokens,
    // restated; stream-packed sequence count is ceiling division.
    "pipe3_train_manifest" ->
      """WITH survivors AS (
        |  SELECT doc_id, text FROM (
        |    SELECT doc_id, text,
        |           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |    FROM documents) d WHERE rn = 1),
        |labeled AS (
        |  SELECT CASE WHEN substring(md5(text), 1, 2) < 'cc' THEN 'train'
        |              WHEN substring(md5(text), 1, 2) < 'e6' THEN 'val'
        |              ELSE 'test' END AS split,
        |         CAST(len(list_filter(string_split_regex(text, '\s+'),
        |                              x -> x <> '')) AS BIGINT) AS n_tok
        |  FROM survivors)
        |SELECT split, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       divide(CAST(sum(n_tok) AS BIGINT) + 511, 512) AS n_seqs
        |FROM labeled GROUP BY split ORDER BY split""".stripMargin,
    // 5-grams via d3's oracle idiom: range end is exclusive in DuckDB,
    // inclusive slice w[i:i+4]; <5-token docs fall out as empty lists.
    "t14_decontamination" ->
      s"""WITH g AS (
         |  SELECT doc_id,
         |         unnest(list_distinct(list_transform(range(1, len(w) - 3),
         |                i -> array_to_string(list_slice(w, i, i+4), ' ')))) AS gram
         |  FROM (SELECT doc_id, $wordsSql AS w FROM documents)
         |  WHERE len(w) >= 5),
         |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 7),
         |tr AS (SELECT doc_id, gram FROM g WHERE doc_id % 10 <> 7)
         |SELECT doc_id, count(*) AS n_contaminated_grams
         |FROM tr JOIN ev USING (gram)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t15_doc_chunks" ->
      """WITH idx AS (
        |  SELECT doc_id, text,
        |         unnest(range(0, CAST(floor((length(text) - 1) / 384.0) AS BIGINT) + 1))
        |           AS chunk_idx
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id, chunk_idx,
        |       chunk_idx * 384 + 1 AS start_pos,
        |       CAST(length(substring(text, CAST(chunk_idx * 384 + 1 AS INT), 512)) AS BIGINT)
        |         AS chunk_len,
        |       md5(substring(text, CAST(chunk_idx * 384 + 1 AS INT), 512)) AS chunk_hash
        |FROM idx ORDER BY doc_id, chunk_idx""".stripMargin,
    "t16_seq_packing" ->
      s"""WITH toks AS (
         |  SELECT doc_id, CAST(len($wordsSql) AS BIGINT) AS n_tok FROM documents),
         |packed AS (
         |  SELECT doc_id, n_tok,
         |         CAST(floor(CAST(sum(n_tok) OVER (ORDER BY doc_id) - n_tok AS DOUBLE)
         |                    / 1024.0) AS BIGINT) AS pack_id
         |  FROM toks)
         |SELECT pack_id, count(*) AS n_docs,
         |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM packed GROUP BY pack_id ORDER BY pack_id""".stripMargin,
    "t17_mixture_weights" ->
      s"""WITH src AS (
         |  SELECT source, count(*) AS n_docs,
         |         CAST(sum(len($wordsSql)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |weighted AS (
         |  SELECT *, CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 6) AS DECIMAL(18,6))
         |              AS w_raw
         |  FROM src)
         |SELECT source, n_docs, n_tokens,
         |       round(CAST(w_raw AS DOUBLE)
         |             / CAST(sum(w_raw) OVER () AS DOUBLE), 6) AS weight,
         |       CASE WHEN n_tokens > 0 THEN
         |         round(round(CAST(w_raw AS DOUBLE)
         |                     / CAST(sum(w_raw) OVER () AS DOUBLE), 6)
         |               * CAST(sum(n_tokens) OVER () AS DOUBLE)
         |               / CAST(n_tokens AS DOUBLE), 6)
         |       ELSE 0.0 END AS oversample_factor
         |FROM weighted ORDER BY source""".stripMargin,
    "d9_block_dedup" ->
      s"""WITH blk AS (
         |  SELECT doc_id,
         |         unnest(list_transform(
         |           range(0, CAST(ceil(len(w) / 10.0) AS BIGINT)),
         |           b -> md5(array_to_string(list_slice(w, b*10+1, b*10+10), ' ')))) AS block_hash
         |  FROM (SELECT doc_id, $wordsSql AS w FROM documents)
         |  WHERE len(w) > 0)
         |SELECT block_hash, count(DISTINCT doc_id) AS n_docs,
         |       count(*) AS n_occurrences
         |FROM blk GROUP BY block_hash
         |HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY block_hash""".stripMargin)
}
