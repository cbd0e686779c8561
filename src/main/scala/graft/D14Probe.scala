package graft

import org.apache.spark.sql.SparkSession

/** Wall-clock probe for d14's containment join at replica scale, salted
  * vs unsalted: the r11 100× pass read d14 at 368 s with the unprefixed
  * side's hot shingle buckets spilling one partition (GCLocker retries
  * at 53 GB heap — SURVEY §17 "single-box shuffle pressure"). The
  * salting fix (the d4 discipline, r11 verdict #1) must be MEASURED at
  * the same scale, not argued: this prints one JSON line per mode so
  * the 100× documents replica shows the spill class leaving.
  *
  * Usage: runMain graft.D14Probe <sfDir> <salted|unsalted|both> [reps]
  */
object D14Probe {
  def main(args: Array[String]): Unit = {
    val (sfDir, mode, reps) = (args(0), args(1), args.lift(2).map(_.toInt).getOrElse(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val modes = mode match {
      case "both" => Seq("salted", "unsalted")
      case m      => Seq(m)
    }
    // Untimed warmup: builds the session-cached shingle arrays (and
    // JITs the kernels) so every timed leg rides the same cache state —
    // leg order otherwise charges the Θ(corpus) cache build to
    // whichever mode runs first (measured: 540 s first leg vs 187 s
    // second for the SAME query).
    operators.Dedup.d14Containment(spark, sfDir, Long.MaxValue).count(): Unit
    modes.foreach { m =>
      val hotMin = if (m == "salted") operators.Dedup.D14HotMin else Long.MaxValue
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = operators.Dedup.d14Containment(spark, sfDir, hotMin).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = walls.map(_._1).sorted.apply(walls.length / 2)
      println(f"""{"probe":"d14_$m%s","wall_median_s":$med%.2f,""" +
        s""""pairs":${walls.head._2},"reps":$reps,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
