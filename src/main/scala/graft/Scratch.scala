package graft

import java.io.File
import java.nio.file.{Files, Paths}

/** One run-scoped scratch root for every sink, checkpoint, layout copy,
  * and spec fixture the engine materializes.
  *
  * Why this exists: scratch paths used to be minted ad-hoc under
  * `java.io.tmpdir` (session-unique suffixes, spec `createTempDirectory`
  * calls) and never reaped — a box that ran a few hundred sessions
  * accumulated ~600 dead `/tmp/graft_*` dirs, and the resulting
  * filesystem state measurably inflated write-heavy bench numbers
  * (w9 6.4 s on a dirty box vs 1.35 s clean; the round-8 driver bench
  * read w10 at 2.48 s where a clean box measures ~1.7 s). Scratch
  * hygiene is therefore a MEASUREMENT-CORRECTNESS concern, not
  * housekeeping: a phantom 2× "regression" costs a round of chasing.
  *
  * Contract:
  *   - [[root]] is one per-JVM directory `graft-run-<pid>-<nonce>`,
  *     created lazily, deleted recursively by a JVM shutdown hook —
  *     a clean exit leaves NOTHING behind.
  *   - [[sweepStale]] (called by the Bench/Verify mains, which the
  *     driver runs serially) deletes scratch left by DEAD runs: any
  *     `graft-run-*` root whose embedded pid is no longer alive, plus
  *     legacy flat `graft_*` dirs from pre-Scratch sessions. It returns
  *     the counts so the bench artifact records how dirty the box was
  *     (a dirty box explains odd w-family numbers in-band).
  *
  * Persistent warehouse artifacts (bucketed catalog tables, the graph
  * edge artifact, the d8/d10 band index, s6's ANN index) are NOT
  * scratch — they live under `spark.sql.warehouse.dir` and are
  * untouched by any path here. (The TEST session deliberately points
  * its warehouse INTO the run root — a fresh per-JVM warehouse, so no
  * spec can pass off a stale prior-session artifact; the driver-facing
  * mains keep whatever persistent warehouse they are given.)
  */
object Scratch {
  private val tmpBase = System.getProperty("java.io.tmpdir")

  /** The per-JVM scratch root; created on first use, reaped at exit. */
  lazy val root: String = {
    val pid = ProcessHandle.current().pid()
    val dir = Files.createTempDirectory(Paths.get(tmpBase), s"graft-run-$pid-")
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => deleteRecursively(dir.toFile), "graft-scratch-reaper"))
    dir.toString
  }

  /** Stable path under the run root (NOT created — writers create it,
    * exactly as the old flat /tmp paths behaved). Within one JVM the
    * same name maps to the same path, preserving every existing
    * memoize-by-path scheme. */
  def dir(name: String): String = s"$root/$name"

  /** Fresh unique directory under the run root (created). */
  def tempDir(prefix: String): String =
    Files.createTempDirectory(Paths.get(root), prefix).toString

  def deleteRecursively(f: File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Delete scratch from dead runs; returns (deadRunRoots, 0) swept
    * (the second slot kept for the bench artifact's shape). Only roots
    * whose `graft-run-<pid>-` pid is provably not alive are touched, so
    * a concurrently live graft JVM keeps its scratch. The round-8
    * `graft_*` LEGACY sweep is gone: it existed for pre-Scratch
    * session leftovers (618 of them — all reaped that round; sweeps
    * since report 0) and its unconditional name match would delete a
    * LIVE ThriftServe warehouse started per the README
    * (`/tmp/graft_wh` + its Derby metastore) out from under open JDBC
    * sessions — a long-running server is not a dead run. */
  def sweepStale(): (Int, Int) = {
    val entries = Option(new File(tmpBase).listFiles()).getOrElse(Array.empty[File])
    def pidAlive(name: String): Boolean =
      name.split("-").lift(2).flatMap(_.toLongOption).exists { p =>
        val h = ProcessHandle.of(p)
        h.isPresent && h.get().isAlive
      }
    val deadRuns = entries.filter { f =>
      f.isDirectory && f.getName.startsWith("graft-run-") &&
        f.getAbsolutePath != root && !pidAlive(f.getName)
    }
    deadRuns.foreach(deleteRecursively)
    (deadRuns.length, 0)
  }
}
