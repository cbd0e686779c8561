package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r13 compiled per-doc CDC-chunking closure (t29) against the
  * posexplode → per-doc-window prefix-sum → collect_list construction it
  * replaced, on the fixture plus boundary docs: empty, under/exactly 4
  * tokens (the first possible cut position), repeated tokens, whitespace
  * runs, unicode, null. Every output column is compared. */
class T29CdcEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("t29 chunk closure equals the windowed prefix-sum construction") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val adversarial = Seq(
      930001L -> "", 930002L -> "one", 930003L -> "one two three",
      930004L -> "one two three four",
      930005L -> "one two three four five six seven eight nine ten",
      930006L -> ("tok " * 200).trim, // long repeat: many cut candidates
      930007L -> "  pad\ta\nb  c d e f  ", 930008L -> "héllo wörld — naïve café x",
      930009L -> (null: String))
      .toDF("doc_id", "text")
    val sample = Tables(spark, dir).documents.select($"doc_id", $"text")
      .unionByName(adversarial)
    val wv = filter(split($"text", "\\s+"), w => w =!= lit(""))
    val toks = sample
      .select($"doc_id", wv.as("w"))
      .select($"doc_id", $"w", posexplode($"w").as(Seq("p0", "tok")))
      .select($"doc_id", $"tok", ($"p0" + 1).cast("long").as("i"),
        (($"p0" >= 3) &&
          substring(md5(concat_ws(" ", slice($"w", $"p0" - 2, lit(4)))), 32, 1)
            === "0").cast("int").as("cut"))
    val wd = Window.partitionBy($"doc_id").orderBy($"i")
      .rowsBetween(Window.unboundedPreceding, -1)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getString(4)))
    val expected = toks
      .withColumn("chunk_id", coalesce(sum($"cut").over(wd), lit(0)).cast("long"))
      .groupBy($"doc_id", $"chunk_id")
      .agg(min($"i").as("start_tok"), count(lit(1)).as("n_toks"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct($"i", $"tok"))),
            s => s.getField("tok")))).as("chunk_hash"))
      .collect().map(key).toMap
    val actual = graft.operators.PipelineOps.t29KernelForTest(sample)
      .collect().map(key).toMap
    assert(actual.keySet == expected.keySet,
      s"chunk key divergence: ${(actual.keySet diff expected.keySet).take(3)} / " +
        s"${(expected.keySet diff actual.keySet).take(3)}")
    val diff = actual.collect { case (k, v) if expected(k) != v => (k, v, expected(k)) }
    assert(diff.isEmpty, s"chunk content divergence: ${diff.take(3)}")
  }
}
