package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (D13Probe's pattern): time the graph_frames build phases —
  * the persisted-artifact write/registration vs the in-session
  * checkpoint materializations vs the mutual-kNN derivation — so build
  * optimization targets measurement, not guesswork.
  *
  *   sbt "runMain graft.GraphBuildProbe /root/testdata/sf0.1"
  */
object GraphBuildProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[graphprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    t("warehouse ensure")(graft.operators.CatalogOps.ensure(spark, dir))
    t("artifact (tables+meta)")(
      graft.operators.Graph.ensureGraphArtifact(spark, dir))
    val (pairs, w, nodes) = t("graphFrames memo build")(
      graft.operators.Graph.graphFrames(spark, dir))
    t("pairs ckpt count")(pairs.count())
    t("edges ckpt count")(w.count())
    t("nodes ckpt count")(nodes.count())
    // Replicated mutualKnn pipeline, stage by stage (probe-only copy).
    locally {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val capWin = Window.partitionBy($"ck").orderBy($"n".desc, $"sk")
      val capped = pairs.withColumn("dr", row_number().over(capWin))
        .filter($"dr" <= 256).select($"ck", $"sk")
      t("mk: capped count")(capped.count())
      val co = capped.select($"ck", $"sk".as("s1"))
        .join(capped.select($"ck", $"sk".as("s2")), Seq("ck"))
        .filter($"s1" < $"s2")
        .groupBy($"s1", $"s2").agg(count(lit(1)).as("shared"))
      t("mk: co-occurrence agg count")(co.count())
      val directed = co.select(explode(array(
          struct($"s1".as("s"), $"s2".as("t")),
          struct($"s2".as("s"), $"s1".as("t")))).as("e"), $"shared")
        .select($"e.s", $"e.t", $"shared")
      val top = Window.partitionBy($"s").orderBy($"shared".desc, $"t")
      val mutual = directed.withColumn("rn", row_number().over(top))
        .filter($"rn" <= 5)
        .select(least($"s", $"t").as("a"), greatest($"s", $"t").as("b"))
        .groupBy($"a", $"b").agg(count(lit(1)).as("c"))
        .filter($"c" === 2).select($"a", $"b")
      t("mk: full pipeline count")(mutual.count())
    }
    t("mutualKnn build+count")(
      graft.operators.Graph.mutualKnn(spark, dir).count())
    t("second ensure (memo-warm)")(
      graft.operators.Graph.ensureGraphFrames(spark, dir))
    spark.stop()
  }
}
