package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The LIVING LSH index: streaming near-dup ingest where the index
  * itself grows with the stream.
  *
  * StreamingFunnel probes each micro-batch against the STATIC history
  * index (d10's posture — correct for pipe2's daily-batch semantics,
  * where "the batch" is one frame). But a continuously-running ingest
  * accumulates: a near-duplicate pair whose two members arrive in
  * DIFFERENT micro-batches is invisible to a static-index probe, and
  * the miss rate grows with stream lifetime. This operator closes
  * that hole the way production near-dup services do — every arriving
  * document's band rows and sketch are APPENDED to the index state, so
  * batch k probes history ∪ everything that arrived before it.
  *
  * Semantics (deliberately index-ALL, not index-survivors): a document
  * is flagged near-dup iff it has Jaccard ≥ 0.8 with any history doc
  * or any EARLIER-ARRIVED streamed doc (earlier micro-batch, or
  * smaller doc_id within the same micro-batch). Indexing every doc —
  * flagged or not — makes the flag a pure function of the arrival
  * prefix, so the result is INVARIANT to how the stream is split into
  * micro-batches (spec-pinned: 1-file and 3-file triggers produce
  * identical flags). Index-survivors-only would make survival a
  * chained sequential fold (c dups b dups a…) whose outcome depends on
  * batch boundaries — a correctness landmine under repartitioned
  * replays, and not what Broder-sketch services deploy.
  *
  * Exactly-once mechanics (the StreamingFunnel discipline, same spec
  * shape across a kill/restart):
  *   - the file source's checkpoint WAL fixes (batchId → input files);
  *   - all per-batch output is batchId-keyed and mode=overwrite —
  *       statePath/flags/<batchId>/     (batch_id, hist_id, jaccard)
  *       statePath/bands/<batchId>/     (doc_id, bkey)
  *       statePath/sketches/<batchId>/  (doc_id, hs, n_sh)
  *     so a replayed batch overwrites its own partial attempt;
  *   - batch k reads deltas of batches STRICTLY BEFORE k only — its
  *     own failed attempt's output is invisible to the replay (reading
  *     ≤ k would flag replayed docs as near-dups of themselves).
  *
  * Scale: per-batch cost is O(batch bands) + O(candidates) — the
  * batch's band keys BROADCAST against the bucketed base index (d10's
  * no-shuffle-on-the-corpus property) and against the accumulated
  * delta frames; sketches are fetched for band-collision candidates
  * only. Delta state grows with STREAM volume (one band row per doc
  * per band, one sketch per doc), and the per-batch read FAN-IN grows
  * with stream lifetime — so [[compact]] periodically folds every
  * committed delta into one versioned living base and deletes the
  * folded dirs (w9's table-service discipline; run in a maintenance
  * window, crash-safe via complete-version detection, flags provably
  * unchanged). At production scale the same fold is a transactional
  * append to the bucketed BandIndexTable/SketchTable themselves —
  * exactly d10's "survivors' rows append" maintenance note. */
object StreamingLshIngest {

  private val Subs = Seq(
    "bands" -> "doc_id BIGINT, bkey BIGINT",
    "sketches" -> "doc_id BIGINT, hs ARRAY<BIGINT>, n_sh BIGINT",
    "flags" -> "batch_id BIGINT, hist_id BIGINT, jaccard DOUBLE")
  private def state(sp: String) = new DeltaState(sp, Subs)

  /** Fold every committed delta into one compacted living base and
    * delete the folded dirs — see [[DeltaState.compact]] for the
    * crash-safety algebra (only `_SUCCESS`-complete deltas fold; an
    * interrupted fold leaves an ignored incomplete version; the
    * visible-but-undeleted window double-reads identical rows, which
    * every reader's distinct() absorbs). Flags fold too — they share
    * the grows-with-lifetime fan-in pathology (every flags() read
    * unions one dir per batch otherwise). Flags produced by later
    * batches are IDENTICAL with or without compaction (spec-pinned). */
  def compact(spark: SparkSession, statePath: String): Unit =
    state(statePath).compact(spark, Map(
      // Replays here are provably bit-identical (the band family never
      // changes), so plain union+distinct folds suffice — contrast the
      // ANN living index's supersede-fold for hits.
      "bands" -> ((b, d) => b.unionByName(d).distinct()),
      "sketches" -> ((b, d) => b.unionByName(d).dropDuplicates("doc_id")),
      "flags" -> ((b, d) => b.unionByName(d).distinct())))

  /** The `foreachBatch` body — public so specs can drive one batch. */
  def processBatch(dir: String, statePath: String)
                  (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    import graft.functions.ArrayFunctions.sortedIntersectCount
    val st = state(statePath)
    Dedup.ensureLshIndex(spark, dir)

    // Row-local signature work on the batch only (the stream side is
    // new data; the corpus is never rescanned). Persisted: the arrays
    // feed banding AND both verification sides within this batch plan.
    val arr = batch.select($"doc_id",
      graft.functions.ShingleFunctions.shingleHashes(spark, $"text").as("hs"))
      .persist()
    try {
    val sk = arr.select($"doc_id", $"hs", size($"hs").cast("long").as("n_sh"))
    val bands = Dedup.bandKeys(Dedup.minhashSignatures(arr)) // (doc_id, bkey)
    val batchBands = bands.select($"doc_id".as("batch_id"), $"bkey")

    // Candidates from the four index strata: the history table (keeps
    // d10's broadcast-probe shape), the compacted living base, the
    // uncompacted deltas, and the batch's own bands. Within-batch
    // pairs order by doc_id — the arrival tiebreak that makes flags
    // split-invariant.
    val baseCand = spark.table(Dedup.BandIndexTable)
      .join(broadcast(batchBands), Seq("bkey"))
      .select($"doc_id".as("hist_id"), $"batch_id")
    val streamedBands = st.prior(spark, "bands", batchId)
    // Anti-join guard: if the stream stopped after processBatch but
    // before the checkpoint commit and compact() then folded that
    // batch's delta, the replay finds its own rows — the whole batch's,
    // not just each doc's own — in the living base. Treating a
    // batchmate as "prior" would emit the REVERSED within-batch pair
    // (earlier doc flagged against later, diverging from the
    // sequential ground truth), so the current batch's doc ids are
    // excluded wholesale: within-batch ordering is solely withinCand's
    // strict `<`.
    val priorCand = streamedBands
      .join(broadcast(arr.select($"doc_id")), Seq("doc_id"), "left_anti")
      .join(broadcast(batchBands), Seq("bkey"))
      .select($"doc_id".as("hist_id"), $"batch_id")
    val withinCand = bands.select($"doc_id".as("hist_id"), $"bkey")
      .join(broadcast(batchBands), Seq("bkey"))
      .filter($"hist_id" < $"batch_id")
      .select($"hist_id", $"batch_id")
    val candidates = baseCand.unionByName(priorCand).unionByName(withinCand)
      .distinct()

    // Exact verification: partner sketches may live in the history
    // sketch store, the compacted base, an uncompacted delta, or this
    // batch itself. The final distinct() also absorbs the harmless
    // double-read window of a crashed compact() (deltas already folded
    // but not yet deleted produce duplicate identical rows).
    val partnerSk = spark.table(Dedup.SketchTable)
      .select($"doc_id", $"hs", $"n_sh")
      .unionByName(st.prior(spark, "sketches", batchId))
      .unionByName(sk)
    candidates
      .join(partnerSk.select($"doc_id".as("hist_id"), $"hs".as("hh"), $"n_sh".as("na")),
        Seq("hist_id"))
      .join(sk.select($"doc_id".as("batch_id"), $"hs".as("hb"), $"n_sh".as("nb")),
        Seq("batch_id"))
      .select($"batch_id", $"hist_id",
        Dedup.jaccard(sortedIntersectCount(spark, $"hh", $"hb"), $"na", $"nb")
          .as("jaccard"))
      .filter($"jaccard" >= 0.8)
      .distinct()
      .write.mode("overwrite").parquet(st.deltaDir("flags", batchId))

    // Grow the index: EVERY batch doc's bands and sketch (see the
    // index-ALL semantics note), keyed by batchId for replay overwrite.
    bands.write.mode("overwrite").parquet(st.deltaDir("bands", batchId))
    sk.write.mode("overwrite").parquet(st.deltaDir("sketches", batchId))
    // finally: a batch that throws (transient FS error, kill) must not
    // leak its cached shingle blocks into the next replay attempt —
    // the driver is long-running.
    } finally arr.unpersist(): Unit
  }

  /** Start the living-index ingest over a parquet file-source stream
    * of documents. `maxFilesPerTrigger` sets the micro-batch grain —
    * flags are provably invariant to it. */
  def start(spark: SparkSession, dir: String, srcPath: String,
            schema: StructType, checkpoint: String, statePath: String,
            trigger: Trigger, maxFilesPerTrigger: Int = 1): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(processBatch(dir, statePath) _)
      .trigger(trigger)
      .start()

  /** All near-dup flags the stream has COMPLETELY written so far —
    * compacted base ∪ complete per-batch deltas (a torn dir from a
    * crashed batch has no `_SUCCESS` and is invisible until its replay
    * rewrites it; a written-but-uncommitted batch's flags ARE visible,
    * which is harmless because its replay provably rewrites the
    * identical rows, and the distinct() absorbs the one crash window
    * where a fold made them visible twice). (batch_id = the flagged
    * arrival, hist_id = its earlier partner, jaccard). Empty frame
    * before any batch. */
  def flags(spark: SparkSession, statePath: String): DataFrame =
    state(statePath).full(spark, "flags").distinct()
}
