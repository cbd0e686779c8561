package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Exact dedup as a NATIVE stateful streaming operator — the
  * exactly-once ingest gate over an at-least-once source. Upstream
  * delivery (Kafka replays, retried file drops, backfill overlaps)
  * re-delivers records; the corpus store must land each key once.
  *
  * StreamingFunnel implements its cross-batch dedup in user space
  * (foreachBatch + batchId-keyed directories — auditable, works with
  * any sink); this twin is the engine-managed posture: streaming
  * `dropDuplicates(key)` keeps first-seen keys in Spark's versioned
  * state store (checkpointed per micro-batch, restored on restart), and
  * the parquet `FileStreamSink`'s commit manifest makes the OUTPUT
  * exactly-once too — a batch that died before its manifest commit
  * replays and overwrites; readers honoring `_spark_metadata` never see
  * uncommitted files. Together: at-least-once in, exactly-once out,
  * surviving kill/restart with zero user-space bookkeeping.
  *
  * Scale: state is |distinct keys| rows hash-partitioned across the
  * cluster (RocksDB-backed state stores at production scale); each
  * micro-batch shuffles only its own rows on the key. Unbounded key
  * domains bound state with `dropDuplicatesWithinWatermark` (keys
  * older than the event-time watermark evict — the right posture when
  * replays arrive within a bounded lag window). */
object StreamingDedup {

  /** Start the dedup ingest over a parquet file-source stream:
    * first-seen row per `key` lands in `outPath` exactly once.
    * `maxFilesPerTrigger=1` gives deterministic micro-batch boundaries
    * (one dropped file per batch, oldest first). */
  def start(spark: SparkSession, srcPath: String, schema: StructType,
            key: String, checkpoint: String, outPath: String,
            trigger: Trigger): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .dropDuplicates(key)
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .start()

  /** The deduped store as a batch frame — reads through the sink's
    * `_spark_metadata` commit manifest, so uncommitted files from a
    * killed batch are invisible (the exactly-once read contract). */
  def result(spark: SparkSession, outPath: String): DataFrame =
    spark.read.parquet(outPath)

  /** Micro-batches the sink has COMMITTED so far (manifest entries;
    * 0 before any). */
  def committedBatches(spark: SparkSession, outPath: String): Int = {
    val meta = new Path(s"$outPath/_spark_metadata")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(meta)) 0
    else fs.listStatus(meta).count(_.getPath.getName.forall(_.isDigit))
  }
}
