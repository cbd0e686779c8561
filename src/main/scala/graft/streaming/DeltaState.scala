package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The versioned delta-store discipline shared by every LIVING index
  * (StreamingLshIngest over documents, StreamingAnnIngest over
  * embeddings): batchId-keyed parquet delta dirs under
  * `statePath/<sub>/<batchId>` plus a versioned compacted base under
  * `statePath/base/v<N>/<sub>`, with crash-safety decided purely by
  * parquet `_SUCCESS` markers — no manifest file, no coordination.
  *
  * Invariants every user relies on (spec-pinned in both ingest specs):
  *   - a delta dir is VISIBLE only once its `_SUCCESS` committed; a
  *     batch that crashed mid-write leaves a markerless dir every
  *     reader ignores and its replay overwrites (mode=overwrite);
  *   - a base version is VISIBLE only once ALL sub dirs carry
  *     `_SUCCESS`; an interrupted [[compact]] leaves an ignored
  *     incomplete version and a re-run heals;
  *   - [[compact]] folds only COMPLETE deltas, so a crashed batch's
  *     partial task output can never become permanent base content;
  *   - the crash window of a compact that became visible but died
  *     before deleting folded deltas double-reads identical rows —
  *     absorbed because every fold and every read path dedups
  *     (the per-sub `dedup` transform, and readers' distinct()s).
  *
  * At production scale each fold is a transactional append to the
  * bucketed index tables themselves (w9's table-service pass, run in a
  * maintenance window); here the versioned-dir form keeps the exact
  * same visibility algebra on any Hadoop filesystem. */
final class DeltaState(statePath: String, subs: Seq[(String, String)]) {
  private val ddlOf = subs.toMap
  private def ddl(sub: String): String = ddlOf(sub)

  def deltaDir(sub: String, batchId: Long): String = s"$statePath/$sub/$batchId"

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def emptyOf(spark: SparkSession, ddl: String): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType.fromDDL(ddl))

  /** COMPLETE delta dirs `statePath/<sub>/<i>` for i < batchId (all of
    * them for batchId = Long.MaxValue). Completeness = the parquet
    * `_SUCCESS` marker. */
  def deltaPaths(spark: SparkSession, sub: String, batchId: Long): Array[Path] = {
    val root = new Path(s"$statePath/$sub")
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.forall(_.isDigit) && p.getName.toLong < batchId &&
        fs.exists(new Path(p, "_SUCCESS")))
  }

  /** Union of the complete delta dirs strictly before `batchId`; an
    * empty frame of the sub's DDL when none exist (first batch, a
    * fresh state root, or everything compacted). */
  def priorDeltas(spark: SparkSession, sub: String, batchId: Long): DataFrame = {
    val prev = deltaPaths(spark, sub, batchId).map(_.toString)
    if (prev.isEmpty) emptyOf(spark, ddl(sub)) else spark.read.parquet(prev: _*)
  }

  /** Highest base version whose EVERY sub dir carries `_SUCCESS`. */
  def completeBaseVersion(spark: SparkSession): Option[Long] = {
    val root = new Path(s"$statePath/base")
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) None
    else fs.listStatus(root).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.drop(1).forall(_.isDigit))
      .map(_.drop(1).toLong)
      .filter(v => subs.forall { case (s, _) =>
        fs.exists(new Path(s"$statePath/base/v$v/$s/_SUCCESS")) })
      .sorted.lastOption
  }

  /** The compacted living base for one sub (empty frame before any
    * compaction). */
  def livingBase(spark: SparkSession, sub: String): DataFrame =
    completeBaseVersion(spark) match {
      case Some(v) => spark.read.parquet(s"$statePath/base/v$v/$sub")
      case None => emptyOf(spark, ddl(sub))
    }

  /** Living base ∪ complete deltas strictly before `batchId` — what a
    * probing batch may see as "prior". */
  def prior(spark: SparkSession, sub: String, batchId: Long): DataFrame =
    livingBase(spark, sub).unionByName(priorDeltas(spark, sub, batchId))

  /** Everything completely written so far: base ∪ all complete deltas.
    * Callers dedup (a visible-but-uncommitted batch's replay rewrites
    * identical rows; a crashed compact's window double-reads them). */
  def full(spark: SparkSession, sub: String): DataFrame =
    prior(spark, sub, Long.MaxValue)

  /** Write a NEW base version from `frames` (one per sub, evaluated
    * lazily at write time) and delete superseded versions. The version
    * becomes visible only once every sub's `_SUCCESS` committed; a
    * crash mid-publish leaves an ignored incomplete version and a
    * re-run overwrites the same version number. Frames may READ the
    * current base — the new version is a different directory, so the
    * read side is never overwritten mid-scan. */
  def publishVersion(spark: SparkSession, frames: Map[String, DataFrame => DataFrame],
                     source: String => DataFrame): Unit = {
    val next = completeBaseVersion(spark).getOrElse(-1L) + 1
    subs.foreach { case (sub, _) =>
      frames(sub)(source(sub))
        .write.mode("overwrite").parquet(s"$statePath/base/v$next/$sub")
    }
    val fs = fsOf(spark, new Path(statePath))
    (0L until next).foreach(v =>
      fs.delete(new Path(s"$statePath/base/v$v"), true))
  }

  /** Fold every committed delta into one compacted living base and
    * delete the folded dirs — bounding per-batch read fan-in, which
    * otherwise grows with stream LIFETIME. Run while the stream is
    * stopped (a maintenance window, like w9's table service).
    * `fold` is the per-sub combine: it receives the CURRENT living
    * base and the union of complete deltas SEPARATELY, so a sub whose
    * replay may legitimately rewrite rows (the ANN index's hits after
    * a reindex changed the family) can give delta rows precedence
    * over already-folded base rows, while plain subs just
    * union+distinct. */
  def compact(spark: SparkSession,
              fold: Map[String, (DataFrame, DataFrame) => DataFrame]): Unit = {
    val folded = subs.map { case (s, _) =>
      s -> deltaPaths(spark, s, Long.MaxValue) }.toMap
    if (folded.values.forall(_.isEmpty)) return
    publishVersion(spark,
      subs.map { case (s, _) =>
        s -> ((_: DataFrame) =>
          fold(s)(livingBase(spark, s), priorDeltas(spark, s, Long.MaxValue)))
      }.toMap,
      sub => livingBase(spark, sub))
    // Visible now; clean up the folded deltas.
    val fs = fsOf(spark, new Path(statePath))
    folded.values.flatten.foreach(p => fs.delete(p, true))
  }
}
