package graft

import org.scalatest.funsuite.AnyFunSuite

/** Run-to-run determinism over the whole catalog: the driver's
  * correctness gate hash-compares exact row sequences, so ANY
  * nondeterminism (missing total ORDER BY, rank ties, unstable
  * partition merge) is a latent gate failure. Collecting every query
  * twice catches it early — this guard found the orderBy+coalesce(1)
  * reordering that Verify now works around. */
class DeterminismSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name is run-to-run deterministic") {
      val a = fn(spark, dir).collect().toSeq
      val b = fn(spark, dir).collect().toSeq
      assert(a == b, s"$name returned different row sequences across runs")
    }
  }
}
