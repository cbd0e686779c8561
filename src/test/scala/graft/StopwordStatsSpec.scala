package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fused StopwordStats byte kernel (r13; t2/t5/pipe1's
  * n_tok/n_stop) against the expression forms it replaced — token count
  * = `size(filter(split(text, "\\s+"), _ != ""))`, stopword count = the
  * `isin` filter over those tokens — on fixture + adversarial strings +
  * seeded fuzz (whitespace variants, stopwords at string boundaries,
  * case sensitivity, multi-byte lookalikes, null). */
class StopwordStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val Stopwords = Seq("the", "a", "of", "and", "is", "to", "in")

  private def diffAgainstExpr(texts: org.apache.spark.sql.DataFrame) = {
    val w = filter(split(col("text"), "\\s+"), x => x =!= lit(""))
    texts
      .select(col("text"),
        graft.functions.StopwordStatsFunctions.stopwordStats(spark, col("text"))
          .as("sw"),
        size(w).cast("long").as("r_tok"),
        size(filter(w, x => x.isin(Stopwords.map(lit(_)): _*)))
          .cast("long").as("r_stop"))
      .filter(!(col("sw.n_tok") <=> col("r_tok"))
        || !(col("sw.n_stop") <=> col("r_stop")))
  }

  test("stopword kernel equals the split+filter forms (adversarial + null)") {
    import spark.implicits._
    val adversarial = Seq(
      "", "   ", "the", " the ", "the the the", "The", "THE", "a", "a a",
      "to in of and is the a", "xthe they athe the.", "the,", "is!",
      "tabs\tthe\nandof\fis\rto", "héllo the wörld a",
      "日本語 the テキスト", "ä a ö of", "the" + " " + "a", // NBSP is NOT \s
      "word the word", "in", "in in in in", "-a a- a")
    val df = (adversarial.map(Option(_)) :+ (None: Option[String])).toDF("text")
    val diff = diffAgainstExpr(df)
    assert(diff.isEmpty, s"kernel/expr divergence: ${diff.take(3).toSeq}")
  }

  test("stopword kernel equals the split+filter forms (fixture + fuzz)") {
    import spark.implicits._
    val docs = Tables(spark, dir).documents.select(col("text"))
    assert(diffAgainstExpr(docs).isEmpty)
    val alphabet = "a ist\tone\nd".toArray
    val rnd = new scala.util.Random(20260819L)
    val fuzz = (1 to 2000).map { _ =>
      new String(Array.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.length))))
    }
    val diff = diffAgainstExpr(fuzz.toDF("text"))
    assert(diff.isEmpty, s"kernel/expr divergence: ${diff.take(3).toSeq}")
  }
}
