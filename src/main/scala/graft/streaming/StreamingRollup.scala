package graft.streaming

import graft.operators.WritePath
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The STREAMING delivery of w12's incremental rollup maintenance:
  * CDC op rows (I/U/D) arrive as a file-source stream and each
  * micro-batch folds through `WritePath.rollupContrib` — the literal
  * batch contribution code — into per-batch partial-aggregate state;
  * the maintained rollup at any moment is base ⊕ Σ(batch partials).
  * This is the production posture of a continuously-maintained
  * materialized view: the base table is NEVER rescanned, a restart
  * loses nothing, and a replayed micro-batch double-counts nothing.
  *
  * Exactly-once mechanics (StreamingFunnel's proven recipe):
  *   - the file source's checkpoint WAL fixes (batchId → input files),
  *     so a replay re-reads exactly the same op rows;
  *   - each batch's contribution partial is keyed BY batchId and
  *     written mode=overwrite into `statePath/delta/<batchId>` — a
  *     replay overwrites its own previous (possibly partial) attempt
  *     and can never touch another batch's state;
  *   - folding is EXACT (counts and decimal sums are associative and
  *     commutative), so ANY micro-batch split of the feed — including
  *     the split the kill/restart produced — folds to the bit-identical
  *     rollup (spec-proven against batch w12).
  *
  * Scale: per micro-batch cost is one map-combined aggregate over the
  * batch (partials are |groups| rows); the delta store grows by
  * |groups| rows per batch and is itself foldable — a production
  * deployment compacts delta/<i> into the base on a schedule, which is
  * just `foldRollup` materialized. */
object StreamingRollup {

  private def deltaDir(statePath: String, batchId: Long) =
    s"$statePath/delta/$batchId"

  /** The `foreachBatch` body — public so the spec can drive a
    * single micro-batch (and its replay) directly. */
  def processBatch(statePath: String)(batch: DataFrame, batchId: Long): Unit =
    WritePath.rollupContrib(batch)
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("dn")).as("n"), sum(col("ds")).as("s"))
      .write.mode("overwrite").parquet(deltaDir(statePath, batchId))

  def start(spark: SparkSession, srcPath: String, schema: StructType,
            checkpoint: String, statePath: String,
            trigger: Trigger): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(processBatch(statePath) _)
      .trigger(trigger)
      .start()

  /** Number of delta batches recorded so far (0 before any). */
  def deltaBatches(spark: SparkSession, statePath: String): Int = {
    val root = new Path(s"$statePath/delta")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) 0 else fs.listStatus(root).length
  }

  /** The maintained rollup as of the latest recorded batch: base ⊕
    * all delta partials, via the literal batch fold. */
  def maintained(spark: SparkSession, dir: String, statePath: String): DataFrame = {
    val root = new Path(s"$statePath/delta")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = WritePath.rollupBase(spark, dir)
    val dirs =
      if (!fs.exists(root)) Array.empty[String]
      else fs.listStatus(root).map(_.getPath.toString)
    val contrib =
      if (dirs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType.fromDDL(
            "o_orderpriority STRING, dn BIGINT, ds DECIMAL(28,6)"))
      else spark.read.parquet(dirs: _*)
        .select(col("o_orderpriority"), col("n").as("dn"), col("s").as("ds"))
    WritePath.foldRollup(base, contrib)
  }
}
