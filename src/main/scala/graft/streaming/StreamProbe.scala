package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Throughput probe for the transformWithState (v2) ledger: replays a
  * fixture/replica events table through [[StreamOps.typedLedger]] as a
  * real file-source stream on the RocksDB state store with CHANGELOG
  * CHECKPOINTING enabled (the v2 checkpoint format — per-batch delta
  * files instead of full SST uploads, so commit cost tracks the batch's
  * CHANGES, not total state size). Prints one JSON line:
  *
  *   {"probe":"stream_ledger","rows":N,"wall_s":W,"rows_per_s":R,
  *    "state_rows":S,"batches":B,"sf":dir}
  *
  * Usage: runMain graft.streaming.StreamProbe <sfDir>
  * (SPARK_GRAFT_CPUS to size local[]; replicas from graft.ScaleUp.)
  * Results are recorded in SURVEY §15's scaling table — the probe
  * exists so the ledger's rows/s and state growth are MEASURED at the
  * 10×/100× events replicas rather than argued.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val path = s"$sfDir/events.parquet"
    if (graft.Tables.eventsCarriesNanos(spark, sfDir))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchSchema = spark.read.parquet(path).schema
    // A 1× fixture's events.parquet is a single FILE (replica dirs are
    // directories); FileStreamSource anchors basePath at the source
    // path itself, which must be a directory — stage the file into a
    // scratch dir (run-scoped, reaped at exit) in that case.
    val srcFile = new java.io.File(path)
    val streamPath =
      if (srcFile.isFile) {
        val staged = graft.Scratch.tempDir("stream_probe_src")
        java.nio.file.Files.copy(srcFile.toPath,
          java.nio.file.Paths.get(staged, srcFile.getName))
        staged
      } else path
    val events = spark.readStream.schema(batchSchema).parquet(streamPath)
      .select(col("user_id"), col("event_type"), col("value"))
      .as[StreamOps.UserEvent]

    val t0 = System.nanoTime()
    val q = StreamOps.typedLedger(events).toDF()
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", graft.Scratch.tempDir("stream_probe_ckpt"))
      // count() forces full per-key state work; the output itself is
      // |users|-sized, never written anywhere.
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.count(): Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9

    val progress = q.recentProgress
    val rows = progress.map(_.numInputRows).sum
    val stateRows = progress.reverse.flatMap(_.stateOperators.headOption)
      .headOption.map(_.numRowsTotal).getOrElse(-1L)
    println(f"""{"probe":"stream_ledger","rows":$rows,"wall_s":$wall%.2f,""" +
      f""""rows_per_s":${rows / wall}%.0f,"state_rows":$stateRows,""" +
      s""""batches":${progress.length},"sf":"$sfDir"}""")
    spark.stop()
  }
}
