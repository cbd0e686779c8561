package graft

import org.apache.spark.sql.SparkSession

/** Wall-clock probe for d13's assignment tiers at replica scale: builds
  * the SemDeDup verdict with the two-level (`2`) or force-engaged
  * three-level (`3`) routing and prints one JSON line per rep. Exists
  * so the third level's cost is MEASURED at the 10×/100× embeddings
  * replicas rather than argued (SURVEY §15).
  *
  * Usage: runMain graft.D13Probe <sfDir> <2|3> [reps]
  */
object D13Probe {
  def main(args: Array[String]): Unit = {
    val (sfDir, mode, reps) = (args(0), args(1), args.lift(2).map(_.toInt).getOrElse(3))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val walls = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      val df =
        if (mode == "3") operators.Similarity.d13Build3(spark, sfDir, 250.0)
        else operators.Similarity.d13Build2(spark, sfDir, 250.0)
      val kept = df.filter(org.apache.spark.sql.functions.col("kept")).count()
      val wall = (System.nanoTime() - t0) / 1e9
      (wall, kept)
    }
    val med = walls.map(_._1).sorted.apply(walls.length / 2)
    println(f"""{"probe":"d13_level$mode","wall_median_s":$med%.2f,""" +
      s""""kept":${walls.head._2},"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
