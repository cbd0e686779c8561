package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool for the optimization rounds: capture `.explain("formatted")`
  * for a named list of catalog queries into per-query files —
  * `plans/r12/<query>_<suffix>.txt` — the before/after plan evidence the
  * optimization writeup cites. Mirrors the bench's session shape
  * (local[32], shuffle.partitions=32, AQE defaults) so the captured
  * INITIAL plans match what the bench runs; each query is also executed
  * once (noop) first so the AQE-final plan is captured too.
  *
  *   sbt "runMain graft.R12Plans /root/testdata/sf0.1 plans/r12 before q1,q2,..."
  */
object R12Plans {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, list) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    graft.operators.CatalogOps.ensure(spark, sfDir)
    SparkEntry.artifactBuilds.foreach { case (_, _, ensure) => ensure(spark, sfDir) }
    list.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      spark.sparkContext.setJobDescription(s"r12plans: $name")
      // collect() (not a noop write) so THIS queryExecution's
      // AdaptiveSparkPlan is the one executed — the explain below then
      // prints the AQE-FINAL plan (ReusedExchange/ReusedQueryStage,
      // runtime join strategy changes), not the initial estimate. A
      // noop write spawns a separate QueryExecution and leaves this
      // one unexecuted (first capture of this round made exactly that
      // mistake and read duplicate subtrees AQE had in fact deduped).
      df.collect()
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan.trim + "\n")
      spark.catalog.clearCache()
      System.err.println(s"[r12plans] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
