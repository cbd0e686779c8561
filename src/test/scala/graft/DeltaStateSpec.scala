package graft

import graft.streaming.DeltaState
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Filesystem-level pins for the delta-store visibility algebra BOTH
  * living indexes (StreamingLshIngest, StreamingAnnIngest) ride:
  * `_SUCCESS`-complete visibility for deltas and base versions, the
  * strictly-before read rule, fold + cleanup, and every crash window
  * the scaladoc claims is safe — exercised here directly against
  * hand-arranged directory states, where the ingest specs can only
  * reach them through crafted streaming histories. */
class DeltaStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  private val Subs = Seq("rows" -> "id BIGINT, v BIGINT")
  private val Dedup = Map("rows" ->
    ((b: org.apache.spark.sql.DataFrame, d: org.apache.spark.sql.DataFrame) =>
      b.unionByName(d).distinct()))

  private def writeDelta(st: DeltaState, b: Long, rows: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(st.deltaDir("rows", b))
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    import spark.implicits._
    df.as[(Long, Long)].collect().toSet
  }

  test("delta visibility: strictly-before reads, torn dirs invisible, replay restores") {
    val root = Scratch.tempDir("ds_vis") + "/state"
    val st = new DeltaState(root, Subs)
    writeDelta(st, 0, Seq((1L, 10L)))
    writeDelta(st, 1, Seq((2L, 20L)))
    writeDelta(st, 2, Seq((3L, 30L)))

    // Batch k sees strictly earlier deltas only.
    assert(ids(st.prior(spark, "rows", 2)) == Set((1L, 10L), (2L, 20L)))
    assert(ids(st.prior(spark, "rows", 0)).isEmpty)
    assert(ids(st.full(spark, "rows")) == Set((1L, 10L), (2L, 20L), (3L, 30L)))

    // A torn dir (crashed mid-write: no _SUCCESS) is invisible to every
    // reader — and a zero-file torn dir must not throw from the read.
    fs.delete(new Path(s"$root/rows/1/_SUCCESS"), false)
    assert(ids(st.full(spark, "rows")) == Set((1L, 10L), (3L, 30L)))
    fs.mkdirs(new Path(s"$root/rows/9"))
    assert(ids(st.full(spark, "rows")) == Set((1L, 10L), (3L, 30L)))

    // The torn batch's replay overwrites and restores visibility.
    writeDelta(st, 1, Seq((2L, 21L)))
    assert(ids(st.full(spark, "rows")) == Set((1L, 10L), (2L, 21L), (3L, 30L)))
  }

  test("compact folds complete deltas only, deletes them, and supersedes old versions") {
    val root = Scratch.tempDir("ds_fold") + "/state"
    val st = new DeltaState(root, Subs)
    writeDelta(st, 0, Seq((1L, 10L)))
    writeDelta(st, 1, Seq((2L, 20L)))
    fs.delete(new Path(s"$root/rows/1/_SUCCESS"), false) // torn

    st.compact(spark, Dedup)
    // v0 holds the complete delta only; the torn dir is left for its
    // replay (never folded — a crashed batch's partial output must not
    // become permanent base content).
    assert(st.completeBaseVersion(spark).contains(0L))
    assert(ids(st.livingBase(spark, "rows")) == Set((1L, 10L)))
    assert(!fs.exists(new Path(s"$root/rows/0")), "folded delta must be deleted")
    assert(fs.exists(new Path(s"$root/rows/1")), "torn delta must survive the fold")

    // The torn batch replays, a second fold supersedes v0 with v1.
    writeDelta(st, 1, Seq((2L, 20L)))
    st.compact(spark, Dedup)
    assert(st.completeBaseVersion(spark).contains(1L))
    assert(ids(st.livingBase(spark, "rows")) == Set((1L, 10L), (2L, 20L)))
    assert(!fs.exists(new Path(s"$root/base/v0")), "superseded version must be deleted")

    // Nothing to fold → no-op (no v2).
    st.compact(spark, Dedup)
    assert(st.completeBaseVersion(spark).contains(1L))
  }

  test("crash windows: incomplete base version ignored; visible-but-undeleted deltas double-read then healed") {
    val root = Scratch.tempDir("ds_crash") + "/state"
    val st = new DeltaState(root, Subs)
    writeDelta(st, 0, Seq((1L, 10L)))

    // Crash DURING fold: a base version dir without _SUCCESS is ignored
    // by every reader and by completeBaseVersion.
    import spark.implicits._
    Seq((99L, 99L)).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$root/base/v0/rows")
    fs.delete(new Path(s"$root/base/v0/rows/_SUCCESS"), false)
    assert(st.completeBaseVersion(spark).isEmpty)
    assert(ids(st.full(spark, "rows")) == Set((1L, 10L)))
    // A re-run heals: it writes the SAME version number over the torn one.
    st.compact(spark, Dedup)
    assert(st.completeBaseVersion(spark).contains(0L))
    assert(ids(st.livingBase(spark, "rows")) == Set((1L, 10L)))

    // Crash AFTER visibility, BEFORE deletions: re-arrange that state by
    // re-writing the already-folded delta. Readers double-read the rows
    // (the documented harmless window — dedup absorbs identical rows),
    // and the next compact heals: folds with dedup, deletes the stragglers.
    writeDelta(st, 0, Seq((1L, 10L)))
    assert(ids(st.full(spark, "rows")) == Set((1L, 10L))) // identical rows, one set
    st.compact(spark, Dedup)
    assert(st.completeBaseVersion(spark).contains(1L))
    assert(ids(st.livingBase(spark, "rows")) == Set((1L, 10L)),
      "dedup must absorb the double-read fold")
    assert(!fs.exists(new Path(s"$root/rows/0")))
  }
}
