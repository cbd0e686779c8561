package graft.streaming

import graft.ScaleUp
import org.apache.spark.sql.SparkSession
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
    graft.operators.Similarity.ensureAnnHistoryIndex(spark, dir)
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

    println(f"""{"probe":"stream_ann_ingest","replicas":$reps,"n_vecs":$nVecs,""" +
      f""""slices":$nSlices,"files_per_trigger":$fpt,"index_build_s":$buildS%.1f,""" +
      f""""ingest_wall_s":$ingestS%.1f,"vecs_per_s":${nVecs / ingestS}%.0f,"hits":$hits}""")
    spark.stop()
  }
}
