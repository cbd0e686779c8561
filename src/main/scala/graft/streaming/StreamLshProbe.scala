package graft.streaming

import graft.ScaleUp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scale probe for [[StreamingLshIngest]]: replicate the documents
  * table R× (ScaleUp's injective vocabulary rename keeps near-dup
  * volume LINEAR in R — no manufactured cross-replica structure),
  * build the history index over the even half, stream the odd half in
  * `nSlices` doc_id-range files, and report ingest wall, docs/s, flag
  * count and delta-state rows. The interesting scale question is
  * whether per-batch cost stays O(batch + candidates) as the corpus
  * and the accumulated delta state grow R× — i.e. whether the living
  * index keeps d10's corpus-size-independent ingest cost.
  *
  * Usage: runMain graft.streaming.StreamLshProbe <sfDir> <replicas>
  *        [nSlices=8] [filesPerTrigger=1]
  * (replicas=1 probes the source fixture in place.) */
object StreamLshProbe {

  /** Stage `rows` into `nSlices` key-RANGE parquet files under `src`,
    * written oldest-first with strictly increasing mtimes — so the
    * file source's arrival order equals key order, which is what makes
    * a living index's sequential ground truth computable. Shared by
    * both living-index probes and their specs (one copy of the
    * range-bound arithmetic and the mtime-ordering trick). */
  def stageSlices(spark: SparkSession, rows: org.apache.spark.sql.DataFrame,
                  src: String, nSlices: Int, key: String = "doc_id"): Unit = {
    import spark.implicits._
    val ids = rows.select(col(key)).as[Long].collect().sorted
    val bounds = (1 until nSlices).map(k => ids(k * ids.length / nSlices))
    (0 until nSlices).foreach { k =>
      val lo = if (k == 0) Long.MinValue else bounds(k - 1)
      val hi = if (k == nSlices - 1) Long.MaxValue else bounds(k)
      rows.filter(col(key) >= lo && col(key) < hi)
        .coalesce(1).write.mode("overwrite").parquet(f"$src/slice$k%02d")
      Thread.sleep(30)
    }
  }

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
        val out = graft.Scratch.tempDir(s"lshprobe_replica_$reps")
        ScaleUp.run(spark, sfDir, out, reps, Set("documents"))
        out
      }

    // Index build (the offline half) timed separately from ingest.
    val t0 = System.nanoTime()
    graft.operators.Dedup.ensureLshIndex(spark, dir)
    val buildS = (System.nanoTime() - t0) / 1e9

    val base = graft.Scratch.tempDir(s"lshprobe_run_$reps")
    val (src, ckpt, state) = (s"$base/src", s"$base/ckpt", s"$base/state")
    val docs = graft.Tables(spark, dir).documents.filter($"doc_id" % 2 === 1)
    val nDocs = docs.count()
    // The even/odd history-vs-stream split survives replication only
    // when ScaleUp's key shift (r·(max+1)) preserves doc_id parity —
    // true iff the source's max(doc_id)+1 is even. Guard it: a silent
    // parity flip would invert history/stream membership per replica
    // and the probe's flags-linear-in-R claim with it.
    val srcOdd = graft.Tables(spark, sfDir).documents
      .filter($"doc_id" % 2 === 1).count()
    require(nDocs == reps * srcOdd,
      s"replica parity broke the even/odd split: $nDocs != $reps x $srcOdd")
    StreamLshProbe.stageSlices(spark, docs, src, nSlices)

    val t1 = System.nanoTime()
    val q = StreamingLshIngest.start(spark, dir, s"$src/*", docs.schema,
      ckpt, state, Trigger.AvailableNow(), maxFilesPerTrigger = fpt)
    q.awaitTermination()
    val ingestS = (System.nanoTime() - t1) / 1e9
    val flags = StreamingLshIngest.flags(spark, state).count()

    println(f"""{"probe":"stream_lsh_ingest","replicas":$reps,"n_docs":$nDocs,""" +
      f""""slices":$nSlices,"files_per_trigger":$fpt,"index_build_s":$buildS%.1f,""" +
      f""""ingest_wall_s":$ingestS%.1f,"docs_per_s":${nDocs / ingestS}%.0f,"flags":$flags}""")
    spark.stop()
  }
}
