package graft.streaming

import graft.operators.Dedup
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The STREAMING delivery of pipe2's incremental-ingest funnel: new
  * documents arrive as a file-source stream and flow the SAME three
  * stages — exact dedup (vs history ∪ everything already streamed) →
  * near-dup probe of the persisted d10 LSH index → fixed-threshold
  * quality gate — via `foreachBatch` over `Dedup.funnelCounts`, the
  * literal batch code. This is the production posture of the reference's
  * ingest writers (they accept documents one request at a time;
  * index.js's POST routes): a continuously-running job whose restart
  * loses nothing and double-counts nothing.
  *
  * Exactly-once mechanics (spec-proven across a mid-stream kill):
  *   - The file source's checkpoint WAL fixes (batchId → input files),
  *     so a replayed micro-batch re-reads exactly the same documents.
  *   - All per-batch state is keyed BY batchId and written with
  *     mode=overwrite into a batchId-named directory — a replay
  *     overwrites its own previous (possibly partial) attempt and can
  *     never touch another batch's state:
  *       statePath/ledger/<batchId>/  one funnel-count row
  *       statePath/seen/<batchId>/    the batch's distinct text hashes
  *   - The cross-batch dedup state read by batch k is the union of
  *     seen/<i> for i < k ONLY — a failed attempt's own partial seen
  *     output is invisible to its replay (reading ≤ k would mark the
  *     replayed docs as duplicates of themselves).
  *
  * Scale: per micro-batch cost is O(batch) + O(index candidates) —
  * identical to pipe2's analysis; the history corpus appears only as
  * its hash set and the persisted index, and the seen-hash state grows
  * with DISTINCT streamed text, not stream volume. At 100 TB the seen
  * store becomes a bucketed table (d8's shape) instead of a directory
  * union, and the ledger a transactional append — the per-batch plan
  * is unchanged. */
object StreamingFunnel {

  private def ledgerDir(statePath: String, batchId: Long) =
    s"$statePath/ledger/$batchId"
  private def seenDir(statePath: String, batchId: Long) =
    s"$statePath/seen/$batchId"

  /** Hashes seen by micro-batches STRICTLY BEFORE `batchId` (see the
    * replay note above), as a `(h)` frame; empty frame when none. */
  private def seenBefore(spark: SparkSession, statePath: String,
      batchId: Long): DataFrame = {
    val root = new Path(s"$statePath/seen")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prev =
      if (!fs.exists(root)) Array.empty[String]
      else fs.listStatus(root).map(_.getPath)
        .filter(p => p.getName.forall(_.isDigit) && p.getName.toLong < batchId)
        .map(_.toString)
    if (prev.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType.fromDDL("h STRING"))
    else spark.read.parquet(prev: _*)
  }

  /** The `foreachBatch` body. Public so a spec (or a batch-replay tool)
    * can drive a single micro-batch directly. */
  def processBatch(dir: String, statePath: String)
                  (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    Dedup.ensureLshIndex(spark, dir)
    val batchArr = batch.select($"doc_id",
      graft.functions.ShingleFunctions.shingleHashes(spark, $"text").as("hs"))
    Dedup.funnelCounts(spark, dir, batch, batchArr,
        seenPrev = Some(seenBefore(spark, statePath, batchId)))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").parquet(ledgerDir(statePath, batchId))
    batch.select(sha2($"text", 256).as("h")).distinct()
      .write.mode("overwrite").parquet(seenDir(statePath, batchId))
  }

  /** Start the funnel over a parquet file-source stream of documents.
    * `maxFilesPerTrigger=1` models a steady feed (and gives the spec
    * deterministic micro-batch boundaries to kill between). */
  def start(spark: SparkSession, dir: String, srcPath: String,
            schema: StructType, checkpoint: String, statePath: String,
            trigger: Trigger): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcPath)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(processBatch(dir, statePath) _)
      .trigger(trigger)
      .start()

  /** The stream-to-date funnel: ledger rows summed. Column names/types
    * match pipe2's single aggregate row exactly. */
  def funnelTotals(spark: SparkSession, statePath: String): DataFrame = {
    val root = new Path(s"$statePath/ledger")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(root).map(_.getPath.toString)
    spark.read.parquet(dirs: _*)
      .agg(sum("n_batch").as("n_batch"),
        sum("n_after_exact").as("n_after_exact"),
        sum("n_after_neardup").as("n_after_neardup"),
        sum("n_ingested").as("n_ingested"))
  }

  /** Number of ledger batches recorded so far (0 before any). */
  def ledgerBatches(spark: SparkSession, statePath: String): Int = {
    val root = new Path(s"$statePath/ledger")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) 0 else fs.listStatus(root).length
  }
}
