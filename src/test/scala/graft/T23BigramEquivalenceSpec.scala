package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r13 compiled bigram closure (t23Bigrams' mapPartitions form)
  * against the expression form it replaced —
  * `filter(size(wv) >= 2)` + `explode(transform(sequence(1, size-1),
  * i => array_join(slice(wv, i, 2), " ")))` over `words(text)` — on the
  * fixture plus boundary docs (0/1/2 words, repeated separators, null). */
class T23BigramEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("t23 bigram closure equals the explode(transform) expression form") {
    import spark.implicits._
    val adversarial = Seq(
      910001L -> "", 910002L -> "   ", 910003L -> "one",
      910004L -> "one two", 910005L -> "one two three",
      910006L -> "  a  b\tc\nd  ", 910007L -> "héllo wörld — café",
      910008L -> (null: String))
      .toDF("doc_id", "text")
    val sample = Tables(spark, dir).documents.select($"doc_id", $"text")
      .unionByName(adversarial)
    val wv = filter(split($"text", "\\s+"), w => w =!= lit(""))
    val expected = sample
      .select($"doc_id", wv.as("wv"))
      .filter(size($"wv") >= 2)
      .select($"doc_id", explode(transform(sequence(lit(1), size($"wv") - 1),
        i => array_join(slice($"wv", i, lit(2)), " "))).as("b"))
      .groupBy($"doc_id", $"b").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val actual = graft.operators.TextAnalysis.t23BigramsKernelForTest(sample)
      .groupBy($"doc_id", $"b").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(actual == expected,
      s"bigram multiset divergence: ${(actual.toSet diff expected.toSet).take(3)} / " +
        s"${(expected.toSet diff actual.toSet).take(3)}")
  }
}
