package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** The d13 THIRD routing level (k^(1/3) hierarchy, engaged above
  * Similarity.Level3K in production): no fixture SF crosses the
  * threshold — the 100× embeddings replica reaches k=2560 < 4096, so
  * the oracle's two-level restatement stays exact at every gated scale
  * — which is exactly why the spec FORCE-builds the three-level path:
  *
  *   (a) with degenerate tiers (every level = the same 8 seeds) the
  *       verdict must equal the two-level build BIT-FOR-BIT — any
  *       divergence is a plumbing bug, not hierarchy approximation;
  *   (b) forced non-degenerate (cell target 10 → k≈205, c0≈35, c00=8
  *       at sf0.01), the routing CONTRACTS hold: every vector assigned
  *       exactly once to a legal cell, csim_r is the true rounded
  *       cosine to the assigned centroid (driver recompute with the
  *       engine's exact arithmetic), per-cell champions are kept, and
  *       assignment agreement with the two-level build is high (the
  *       hierarchy is an approximation of the SAME clustering, not a
  *       different one).
  */
class D13Level3Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
  }
  private def r6(x: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  test("degenerate tiers: forced three-level equals the two-level build bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    // k = c0 = c00 = 8 here — all three tiers are the same seed set.
    val two = Similarity.d13Build2(spark, dir, 250.0)
      .orderBy("vec_id").collect().map(_.toSeq)
    val three = Similarity.d13Build3(spark, dir, 250.0)
      .orderBy("vec_id").collect().map(_.toSeq)
    assert(two.length == three.length && two.length > 0)
    two.zip(three).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("forced non-degenerate three-level: contracts hold, agreement with two-level is high") {
    val dir = "/root/testdata/sf0.01"
    val target = 10.0
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val byId = corpus.toMap
    val nrm = corpus.map { case (id, e) => id -> math.sqrt(dot(e, e)) }.toMap
    val k = math.max(8L, math.ceil(corpus.length / target).toLong)
    val c0 = math.max(8L, math.ceil(math.pow(k.toDouble, 2.0 / 3.0)).toLong)
    val c00 = math.max(8L, math.ceil(math.pow(k.toDouble, 1.0 / 3.0)).toLong)
    assert(c00 < c0 && c0 < k, s"tiers not distinct: $c00/$c0/$k — fixture too small")

    val rows = Similarity.d13Build3(spark, dir, target).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    // Every vector assigned exactly once, to a legal fine cell.
    assert(rows.length == corpus.length)
    assert(rows.map(_._1).toSet == corpus.map(_._1).toSet)
    rows.foreach { case (id, cell, _, _) =>
      assert(cell >= 0 && cell < k, s"vec $id routed to illegal cell $cell")
    }
    // csim_r is the TRUE rounded cosine to the assigned centroid — the
    // hierarchy may pick a different centroid than flat argmax would,
    // but it never fabricates a similarity.
    rows.foreach { case (id, cell, csim, _) =>
      val want = r6(dot(byId(id), byId(cell)) / (nrm(id) * nrm(cell)))
      assert(csim == want, s"vec $id: stored csim $csim != recomputed $want")
    }
    // Per-cell champions (min (csim, id)) are always kept.
    rows.groupBy(_._2).values.foreach { cell =>
      val champ = cell.minBy { case (id, _, csim, _) => (csim, id) }
      assert(champ._4, s"champion ${champ._1} of cell ${champ._2} dropped")
    }
    // Assignment agreement with the two-level build on the SAME
    // clustering: the hierarchy approximates routing, not the model.
    val two = Similarity.d13Build2(spark, dir, target).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = rows.count { case (id, cell, _, _) => two(id) == cell }
    val rate = agree.toDouble / rows.length
    assert(rate >= 0.7, f"assignment agreement $rate%.3f below 0.7")
  }
}
