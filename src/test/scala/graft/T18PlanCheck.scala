package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins t18's r6 rewrite claim: the per-doc entropy histogram is
  * row-local, so the ONLY exchange in the plan is the presentation
  * ORDER BY — the former (doc,char) aggregate's extra shuffle of
  * ~|chars| rows is gone. */
class T18PlanCheck extends AnyFunSuite {
  private val spark = TestSpark.spark
  test("t18 has exactly one exchange (the final sort), none before aggregation") {
    val df = graft.operators.TextAnalysis
      .queries("t18_char_entropy")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges == 1, s"expected only the ORDER BY rangepartitioning exchange:\n$p")
    assert(!p.contains("HashAggregate"), s"histogram must be a HOF fold, not an aggregate:\n$p")
  }
}
