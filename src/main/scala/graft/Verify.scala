package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Same scratch hygiene as Bench: sweep dead runs' sinks/ckpts so
    // repeated verify passes can't accumulate box state.
    val (deadRuns, legacyDirs) = Scratch.sweepStale()
    System.err.println(s"[verify] scratch sweep: $deadRuns dead run roots, $legacyDirs legacy dirs")
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev aid: SPARK_GRAFT_ONLY=a,b restricts the dump (driver leaves it unset).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try {
        // Materialize on the driver then rewrite from a single-partition
        // LocalRelation: `orderBy(...).coalesce(1).write` does NOT reliably
        // preserve the global sort (observed reordering under AQE), and the
        // driver's compare is order-sensitive. Queries are sf0.01-sized
        // here; this is harness plumbing, not the engine's scale path.
        val df = fn(spark, sfDir)
        val rows = java.util.Arrays.asList(df.collect(): _*)
        spark.createDataFrame(rows, df.schema).coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        // A broken query must be a first-class artifact, not silent
        // absence (round-6 lesson: a catastrophic break produced NO
        // correctness rows instead of red ones) — collected into
        // _failures.json below.
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        failures(name) = s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(500)}"
      } finally {
        // Some queries persist() intermediates (d3/d4 shingles); drop them
        // so cached blocks don't accumulate across the ~200-query run.
        // The GC additionally lets ContextCleaner release per-invocation
        // localCheckpoint blocks (clearCache never touches RDD-level
        // storage); memoized frames stay referenced and alive.
        spark.catalog.clearCache()
        System.gc()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val failJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_failures.json"), failJson)
    spark.stop()
    Scratch.deleteRecursively(new java.io.File(Scratch.root))
  }
}
