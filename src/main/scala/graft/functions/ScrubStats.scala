package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused scrub kernel: ONE compiled byte-scan pipeline computing everything
  * t8 spelled as six regex passes —
  *
  *   scrubbed     ≙ regexp_replace(regexp_replace(regexp_replace(text,
  *                    URL, "<URL>"), EMAIL, "<EMAIL>"), NUM, "<NUM>")
  *   n_emails     ≙ regexp_count(text, EMAIL)
  *   n_urls       ≙ regexp_count(text, URL)
  *   n_long_nums  ≙ regexp_count(text, NUM)
  *
  * with URL   = `https?://[^\s]+`
  *      EMAIL = `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`
  *      NUM   = `[0-9]{6,}`
  *
  * Why custom (r12 verdict top-next): after the r12 sort inversion the six
  * NFA passes ran once per row, but they were still the largest remaining
  * per-row kernel cost in the catalog (0.40 s sf0.1, 3.8 s at the 100×
  * replica). Branch-light byte loops replace the NFA; the Java-regex
  * semantics are EMULATED exactly (equivalence spec-pinned against the
  * regexp_* forms over fixture + an adversarial URL/email corpus):
  *
  *   - URL: `https?` is a literal (case-sensitive); `s?` is greedy but the
  *     two branches are mutually exclusive on the byte after "http" ('s'
  *     vs ':'), so no backtracking survives. `[^\s]+` is greedy with
  *     nothing after it → the match runs to the next ASCII whitespace
  *     (`\s` = the six ASCII ws chars without UNICODE_CHARACTER_CLASS;
  *     every multi-byte UTF-8 unit is non-whitespace, so byte runs and
  *     char runs coincide — the TokenStats argument). A failed attempt
  *     advances one byte (matches can start mid-token: "xhttp://y").
  *   - EMAIL: the local class does not contain '@', so the greedy local
  *     run admits NO backtracking — a match at any position inside a
  *     maximal local run requires the byte AFTER the run to be '@', which
  *     holds for all positions of the run or none; scanning may therefore
  *     skip failed runs whole. The domain tail `[A-Za-z0-9.-]+\.[A-Za-z]{2,}`
  *     backtracks the greedy `+` from the right: the match ends at
  *     s+1+len(letter-run) for the LARGEST s in the maximal domain run
  *     with byte '.' at s, at least one domain byte before it, and ≥2
  *     ASCII letters after (the letter run cannot cross the domain run's
  *     end since letters are domain bytes). Nothing follows in the
  *     pattern, so the final `{2,}` keeps its maximal run.
  *   - NUM: a maximal digit run of length ≥ 6 is one match (greedy,
  *     unbounded), shorter runs never match; a failed run skips whole.
  *
  * The nested-replace ORDER is reproduced, not approximated: counts scan
  * the ORIGINAL text; the scrub masks URLs on the original, emails on the
  * URL-masked string, digit runs on the email-masked string — placeholder
  * adjacency effects ("x@y.zzhttp://q" masks as "<EMAIL><URL>" while
  * n_emails counts "x@y.zzhttp") fall out exactly as the regex pipeline
  * produces them. All pattern classes are ASCII, so UTF-8 continuation
  * bytes can never alias into a class and byte positions are exact.
  * (Assumes valid UTF-8 input, as the parquet string columns guarantee —
  * regexp_replace would transcode invalid sequences to U+FFFD where this
  * kernel copies them through; no pattern can match either spelling.)
  */
object ScrubKernel {
  private val UrlMask = "<URL>".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val EmailMask = "<EMAIL>".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private val NumMask = "<NUM>".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
  @inline private def isAlpha(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def isLocal(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '_' || b == '%' || b == '+' || b == '-'
  @inline private def isDomain(b: Byte): Boolean =
    isAlpha(b) || isDigit(b) || b == '.' || b == '-'

  /** Growable byte sink; allocates lazily so match-free rows cost nothing. */
  private final class Builder(hint: Int) {
    private var buf: Array[Byte] = null
    private var len = 0
    def append(src: Array[Byte], from: Int, until: Int): Unit = {
      val n = until - from
      if (n > 0) { reserve(n); System.arraycopy(src, from, buf, len, n); len += n }
    }
    def appendAll(src: Array[Byte]): Unit = {
      reserve(src.length); System.arraycopy(src, 0, buf, len, src.length)
      len += src.length
    }
    private def reserve(n: Int): Unit = {
      if (buf == null) buf = new Array[Byte](math.max(hint, n))
      else if (len + n > buf.length) {
        val nb = new Array[Byte](math.max(buf.length * 2, len + n))
        System.arraycopy(buf, 0, nb, 0, len); buf = nb
      }
    }
    def toBytes: Array[Byte] =
      if (buf == null) Array.emptyByteArray
      else if (len == buf.length) buf
      else java.util.Arrays.copyOf(buf, len)
  }

  /** Non-overlapping `https?://[^\s]+` matches: count, and mask into `out`
    * when non-null. Returns the count; `out` receives the full masked
    * string ONLY if at least one match was found (callers reuse the input
    * array otherwise). */
  private def scanUrls(b: Array[Byte], out: Builder): Long = {
    val n = b.length
    var count = 0L; var last = 0; var i = 0
    while (i < n) {
      var m = -1
      if (i + 7 < n && b(i) == 'h' && b(i + 1) == 't' && b(i + 2) == 't' && b(i + 3) == 'p') {
        var k = -1
        if (b(i + 4) == ':' && b(i + 5) == '/' && b(i + 6) == '/') k = i + 7
        else if (b(i + 4) == 's' && i + 8 < n && b(i + 5) == ':'
          && b(i + 6) == '/' && b(i + 7) == '/') k = i + 8
        if (k >= 0) {
          var e = k
          while (e < n && !isWs(b(e))) e += 1
          if (e > k) m = e
        }
      }
      if (m >= 0) {
        count += 1
        if (out != null) { out.append(b, last, i); out.appendAll(UrlMask); last = m }
        i = m
      } else i += 1
    }
    if (out != null && count > 0) out.append(b, last, n)
    count
  }

  /** Non-overlapping EMAIL matches (Java-regex semantics as argued above). */
  private def scanEmails(b: Array[Byte], out: Builder): Long = {
    val n = b.length
    var count = 0L; var last = 0; var i = 0
    while (i < n) {
      if (isLocal(b(i))) {
        val start = i
        var q = i
        while (q < n && isLocal(b(q))) q += 1
        var matchEnd = -1
        if (q < n && b(q) == '@') {
          val ds = q + 1
          var de = ds
          while (de < n && isDomain(b(de))) de += 1
          var s = de - 1
          while (s >= ds + 1 && matchEnd < 0) {
            if (b(s) == '.') {
              var k = s + 1
              while (k < n && isAlpha(b(k))) k += 1
              if (k - (s + 1) >= 2) matchEnd = k
            }
            s -= 1
          }
        }
        if (matchEnd >= 0) {
          count += 1
          if (out != null) { out.append(b, last, start); out.appendAll(EmailMask); last = matchEnd }
          i = matchEnd
        } else i = q // no position inside this local run can match
      } else i += 1
    }
    if (out != null && count > 0) out.append(b, last, n)
    count
  }

  /** Non-overlapping `[0-9]{6,}` matches: a maximal digit run ≥ 6 long. */
  private def scanNums(b: Array[Byte], out: Builder): Long = {
    val n = b.length
    var count = 0L; var last = 0; var i = 0
    while (i < n) {
      if (isDigit(b(i))) {
        val start = i
        var j = i
        while (j < n && isDigit(b(j))) j += 1
        if (j - start >= 6) {
          count += 1
          if (out != null) { out.append(b, last, start); out.appendAll(NumMask); last = j }
        }
        i = j
      } else i += 1
    }
    if (out != null && count > 0) out.append(b, last, n)
    count
  }

  /** The full t8 kernel: struct(scrubbed, n_emails, n_urls, n_long_nums).
    * Called from both the interpreted eval and the generated code. */
  def compute(t: UTF8String): InternalRow = {
    val b = t.getBytes
    val ub = new Builder(b.length + 16)
    val nUrls = scanUrls(b, ub)
    val s1 = if (nUrls == 0) b else ub.toBytes
    val nEmails = scanEmails(b, null)
    val eb = new Builder(s1.length + 16)
    val s2 = if (scanEmails(s1, eb) == 0) s1 else eb.toBytes
    val nNums = scanNums(b, null)
    val nb = new Builder(s2.length + 16)
    val s3 = if (scanNums(s2, nb) == 0) s2 else nb.toBytes
    new GenericInternalRow(Array[Any](
      UTF8String.fromBytes(s3),
      java.lang.Long.valueOf(nEmails),
      java.lang.Long.valueOf(nUrls),
      java.lang.Long.valueOf(nNums)))
  }
}

/** Expression wrapper: codegen emits a single static call into the shared
  * kernel (no interpreted-eval virtual dispatch in the hot path; the
  * per-row work is the byte scans, not the call). */
case class ScrubStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"scrub_stats requires a string column, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("scrubbed", StringType, nullable = false),
    StructField("n_emails", LongType, nullable = false),
    StructField("n_urls", LongType, nullable = false),
    StructField("n_long_nums", LongType, nullable = false)))
  override def prettyName: String = "scrub_stats"

  override def nullSafeEval(input: Any): Any =
    ScrubKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.ScrubKernel.compute($in);")

  override protected def withNewChildInternal(newChild: Expression): ScrubStats =
    copy(child = newChild)
}

object ScrubStatsFunctions {
  /** Idempotently register for both the Column API and spark.sql. */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "scrub_stats", exprs => ScrubStats(exprs(0)))

  /** struct(scrubbed, n_emails, n_urls, n_long_nums) in one fused pass. */
  def scrubStats(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("scrub_stats", text)
  }
}
