package graft

import org.scalatest.funsuite.AnyFunSuite

/** g1 PageRank: the engine's integer-unit iteration must equal an
  * independent driver-side recompute EXACTLY (the whole point of the
  * 1e-9-unit BIGINT discipline: no float exists for engines or
  * partition order to move), and the ranking must behave like
  * PageRank on the bipartite co-purchase graph. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("g1 equals an exact driver-side integer PageRank; mass and shape sane") {
    import org.apache.spark.sql.functions._
    val t = Tables(spark, dir)
    val pairs = t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_suppkey")).count().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val edges = pairs.flatMap { case (c, s, n) =>
      Seq((s"C$c", s"S$s", n), (s"S$s", s"C$c", n)) }
    val outSum = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val w9 = edges.map { case (src, dst, n) => (src, dst, n * 1000000000L / outSum(src)) }
    val nodes = edges.map(_._1).distinct.sorted
    val nn = nodes.length.toLong
    var r = nodes.map(_ -> 1000000000L / nn).toMap
    for (_ <- 1 to 3) {
      val inc = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((src, dst, wu) <- w9) inc(dst) += r(src) * wu / 1000000000L
      r = nodes.map(v => v -> (150000000L / nn + 85L * inc(v) / 100L)).toMap
    }
    val expected = r.toSeq.sortBy { case (v, ru) => (-ru, v) }.take(100)
    val got = graft.operators.Graph.queries("g1_pagerank")(spark, dir).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    assert(got.toSeq == expected) // bit-exact, including the tie-broken order
    // Mass: every integer division floors, so total mass can only leak
    // DOWN — bounded by one unit per edge contribution + per-node base
    // and damping floors, per iteration.
    val maxLoss = 3L * (w9.length + 2 * nn)
    assert(r.values.forall(_ > 0))
    assert(r.values.sum <= 1000000000L && r.values.sum > 1000000000L - maxLoss)
    // Shape: suppliers aggregate many customers' mass — the top node is one.
    assert(got.head._1.startsWith("S"))
  }
}
