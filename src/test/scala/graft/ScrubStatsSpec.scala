package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence pinning for the fused t8 scrub kernel
  * ([[graft.functions.ScrubKernel]]) against the six-regex pipeline it
  * replaced — the dedicated adversarial corpus the r12 verdict required
  * before fusing: URL/email/number matches are compared via Spark's own
  * regexp_replace/regexp_count (Java regex, the engine t8 used to run),
  * built from the SAME pattern strings the query module declares, over
  *   (a) hand-built adversarial rows targeting every backtracking and
  *       placeholder-adjacency edge the kernel's scaladoc argues about,
  *   (b) the full sf0.001 documents fixture, and
  *   (c) 3000 seeded random strings over a pathological alphabet
  *       (pattern meta-chars, class boundaries, multi-byte UTF-8).
  */
class ScrubStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val UrlRe = graft.operators.TextAnalysis.UrlRe
  private val EmailRe = graft.operators.TextAnalysis.EmailRe
  private val LongNumRe = graft.operators.TextAnalysis.LongNumRe

  /** Kernel columns vs the regex pipeline, null-safe compared; returns
    * the diff rows (must be empty). */
  private def diffAgainstRegex(texts: org.apache.spark.sql.DataFrame) = {
    val scrubbedRe = regexp_replace(
      regexp_replace(
        regexp_replace(col("text"), UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      LongNumRe, "<NUM>")
    texts
      .select(col("text"),
        graft.functions.ScrubStatsFunctions.scrubStats(spark, col("text")).as("ss"),
        scrubbedRe.as("r_scrubbed"),
        regexp_count(col("text"), lit(EmailRe)).cast("long").as("r_emails"),
        regexp_count(col("text"), lit(UrlRe)).cast("long").as("r_urls"),
        regexp_count(col("text"), lit(LongNumRe)).cast("long").as("r_nums"))
      .filter(!(col("ss.scrubbed") <=> col("r_scrubbed"))
        || !(col("ss.n_emails") <=> col("r_emails"))
        || !(col("ss.n_urls") <=> col("r_urls"))
        || !(col("ss.n_long_nums") <=> col("r_nums")))
  }

  test("scrub kernel equals the regex pipeline on the adversarial corpus") {
    import spark.implicits._
    val adversarial: Seq[String] = Seq(
      // — emails: domain-tail backtracking —
      "user@example.com",
      "a.b_c%d+e-f@mail-host.co.uk",
      "user@sub.domain.example.org extra",
      "a@b.com-x after",   // match ends at "com", "-x" survives
      "a@b.co1m",          // digit stops the letter run: match "a@b.co"
      "a@b.c",             // 1-letter TLD: no match
      "a@b..com",          // double dot inside the domain run
      "a@@b.com",          // empty domain before the second '@'
      "a@b.com.x@d.org",   // two matches, the second starting at '.'
      "word.@x.yy",        // trailing dot in the LOCAL part
      "-a@b.de", "a@-.de", "A@B.COM", "a%b@c.io", "a+b@c.dd", "%@x.yy",
      "1@2.34",            // digits cannot satisfy [A-Za-z]{2,}
      "a@b.cc c@d.dd",     // adjacent matches
      "a@b.com.",          // trailing dot AFTER the match
      "a@b.cde12",         // letters then digits: match ends at "cde"
      "x@y.zz", "no-at-sign.example.com", "@nolocal.com", "a@",
      // — URLs —
      "http://a", "https://b/c?d=1#e", "xhttp://y", "http:// space",
      "https://", "HTTP://X", "ftp://x", "httphttp://x",
      "see http://a.b, next",         // trailing comma is non-ws: masked
      "http://ähnlich — tail", // multi-byte bytes are non-ws
      "http://a\tb",                   // tab terminates the match
      "a\u000Bhttp://x",          // vertical tab is \s
      "  http://x  ", "http://x", "https://x",
      // — URL/email/number interplay (nested-replace order) —
      "x@y.zzhttp://q r",   // URL mask changes the email match on s1
      "http://a@b.com more",// email inside a URL: counted, not re-masked
      "http://123456789.com x", // long num inside a URL
      "000001@999999x.com", // two long nums inside one email
      "q@w1234567.com",
      // — long digit runs —
      "123456", "12345", "1234567890123", "abc123456def xx",
      "12345 123456 1234567", "999999", "0000000",
      // — generic adversarial text —
      "", "   ", "!!!", "a", "héllo wörld — naïve café 123456",
      "日本語 user@例え.jp test", // multi-byte domain: no match
      "𝔘𝔫𝔦 http://𝔘.example",
      "tabs\tand\nnewlines\r\nandvt")
    val df = (adversarial.map(Option(_)) :+ (None: Option[String]))
      .toDF("text") // trailing None row pins null-text behavior
    val diff = diffAgainstRegex(df)
    assert(diff.isEmpty, s"kernel/regex divergence: ${diff.take(3).toSeq}")
  }

  test("scrub kernel equals the regex pipeline on the documents fixture") {
    val docs = Tables(spark, dir).documents.select(col("text"))
    val diff = diffAgainstRegex(docs)
    assert(diff.isEmpty, s"kernel/regex divergence: ${diff.take(3).toSeq}")
  }

  test("scrub kernel equals the regex pipeline on seeded pathological fuzz") {
    import spark.implicits._
    // Alphabet chosen to collide with every class boundary the patterns
    // care about: local/domain punctuation, the http prefix letters,
    // digits, whitespace variants, and a multi-byte char.
    val alphabet = "aA0.@-_%+htps:/ \t\né<>".toArray
    val rnd = new scala.util.Random(20260819L)
    val fuzz = (1 to 3000).map { _ =>
      val len = rnd.nextInt(41)
      new String(Array.fill(len)(alphabet(rnd.nextInt(alphabet.length))))
    }
    val diff = diffAgainstRegex(fuzz.toDF("text"))
    assert(diff.isEmpty, s"kernel/regex divergence: ${diff.take(3).toSeq}")
  }
}
