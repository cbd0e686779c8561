package graft.streaming

import graft.ScaleUp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scale probe for [[StreamingAnnIngest]]: replicate the embeddings
  * table R× (ScaleUp's seeded per-replica orthogonal rotation keeps
  * cross-replica cosines low, so candidate volume stays linear in R —
  * no manufactured cross-replica structure), build the history index
  * over the even half, stream the odd half in `nSlices` vec_id-range
  * files, and report build/ingest wall, vectors/s and hit count. The
  * scale question is the same as the LSH probe's: does per-batch cost
  * stay O(batch buckets + candidates) as the corpus and the
  * accumulated delta state grow R× — i.e. does the living vector
  * index keep s6's bucket-pruned probe cost while growing.
  *
  * Usage: runMain graft.streaming.StreamAnnProbe <sfDir> <replicas>
  *        [nSlices=8] [filesPerTrigger=1]
  * (replicas=1 probes the source fixture in place.) */
object StreamAnnProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val nSlices = args.lift(2).map(_.toInt).getOrElse(8)
    val fpt = args.lift(3).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir =
      if (reps <= 1) sfDir
      else {
        val out = graft.Scratch.tempDir(s"annprobe_replica_$reps")
        ScaleUp.run(spark, sfDir, out, reps, Set("embeddings"))
        out
      }

    // Index build (the offline half) timed separately from ingest.
    val t0 = System.nanoTime()
    graft.operators.Similarity.ensureAnnHistoryIndex(spark, dir,
      graft.operators.Similarity.annFamily(spark, dir))
    val buildS = (System.nanoTime() - t0) / 1e9

    val base = graft.Scratch.tempDir(s"annprobe_run_$reps")
    val (src, ckpt, state) = (s"$base/src", s"$base/ckpt", s"$base/state")
    val vecs = graft.Tables(spark, dir).embeddings.filter($"vec_id" % 2 === 1)
    val nVecs = vecs.count()
    // Same parity guard as the LSH probe: the even/odd history-vs-
    // stream split survives replication only when ScaleUp's key shift
    // preserves vec_id parity.
    val srcOdd = graft.Tables(spark, sfDir).embeddings
      .filter($"vec_id" % 2 === 1).count()
    require(nVecs == reps * srcOdd,
      s"replica parity broke the even/odd split: $nVecs != $reps x $srcOdd")
    StreamLshProbe.stageSlices(spark, vecs, src, nSlices, key = "vec_id")

    val t1 = System.nanoTime()
    val q = StreamingAnnIngest.start(spark, dir, s"$src/*", vecs.schema,
      ckpt, state, Trigger.AvailableNow(), maxFilesPerTrigger = fpt)
    q.awaitTermination()
    val ingestS = (System.nanoTime() - t1) / 1e9
    val hits = StreamingAnnIngest.hits(spark, state).count()

    // Serving leg: top-k for a 5-vector query payload over the LIVING
    // index (history + the whole just-ingested stream), uncompacted
    // then compacted — the question a growing index must answer is
    // whether query latency tracks the stream's LIFETIME (delta
    // fan-in) or stays bucket-bounded after the fold.
    val queries = graft.Tables(spark, dir).embeddings
      .filter($"vec_id" < 5).select($"vec_id".as("query_id"), $"embedding")
      .localCheckpoint(true)
    def timeTopK(): Double = {
      val t = System.nanoTime()
      StreamingAnnIngest.topK(spark, dir, state, queries)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t) / 1e9
    }
    val qDeltas = (1 to 3).map(_ => timeTopK()).sorted.apply(1)
    val tc = System.nanoTime()
    StreamingAnnIngest.compact(spark, state)
    val compactS = (System.nanoTime() - tc) / 1e9
    val qBase = (1 to 3).map(_ => timeTopK()).sorted.apply(1)

    // Cached serving leg — the wire path (`serve`): the FIRST call pays
    // the two-tier view build (persist + materialize, a maintenance-
    // boundary cost); steady-state calls ride the in-memory view with a
    // driver-hashed payload. The scale question: does steady-state
    // request latency stay flat while the corpus grows R×.
    val qv = graft.Tables(spark, dir).embeddings.filter($"vec_id" === 1)
      .select($"embedding").as[Seq[Float]].head().toArray
    def timeServe(): Double = {
      val t = System.nanoTime()
      StreamingAnnIngest.serve(spark, dir, state, qv)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t) / 1e9
    }
    val serveBuild = timeServe()
    val serveSteady = (1 to 5).map(_ => timeServe()).sorted.apply(2)

    // Recall leg: the served top-10 vs the EXACT brute-force top-10
    // over the same visible set (history ∪ the whole stream = the full
    // replica table) — the adaptive family's claim is that recall does
    // NOT decay as bits widen, so measure it where it would.
    val (bits, tables) = StreamingAnnIngest.familyOf(spark, dir, state)
    import org.apache.spark.sql.expressions.Window
    // Norms via Similarity.vecNorm — ONE definition of the engine's
    // cosine-norm fold (an inline copy here would let the probe's
    // "exact" ground truth silently diverge from the served path).
    val all = graft.Tables(spark, dir).embeddings
      .select($"vec_id", $"embedding",
        graft.operators.Similarity.vecNorm(spark, $"embedding").as("nrm"))
    val exact = all
      .join(broadcast(queries.withColumn("qn",
        graft.operators.Similarity.vecNorm(spark, $"embedding"))
        .withColumnRenamed("embedding", "qe")), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        round(call_function("float_dot", $"qe", $"embedding") / ($"qn" * $"nrm"), 6)
          .as("sim_r"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"query_id").orderBy($"sim_r".desc, $"neighbor_id")))
      .filter($"rank" <= 10).select($"query_id", $"neighbor_id")
    val served = StreamingAnnIngest.topK(spark, dir, state, queries)
      .select($"query_id", $"neighbor_id")
    val nQ = queries.count()
    val recall = served.intersect(exact).count().toDouble / (10.0 * nQ)

    println(f"""{"probe":"stream_ann_ingest","replicas":$reps,"n_vecs":$nVecs,""" +
      f""""slices":$nSlices,"files_per_trigger":$fpt,"bits":$bits,"tables":$tables,""" +
      f""""index_build_s":$buildS%.1f,""" +
      f""""ingest_wall_s":$ingestS%.1f,"vecs_per_s":${nVecs / ingestS}%.0f,"hits":$hits,""" +
      f""""topk_deltas_s":$qDeltas%.2f,"compact_s":$compactS%.1f,"topk_compacted_s":$qBase%.2f,""" +
      f""""serve_build_s":$serveBuild%.2f,"serve_steady_s":$serveSteady%.2f,""" +
      f""""recall_at_10":$recall%.2f}""")
    spark.stop()
  }
}
