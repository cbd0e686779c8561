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

/** Fused token-statistics kernel: ONE byte pass computing the three
  * counts the text-analysis tier spelled as separate regexes —
  *
  *   - `n_ws_tokens`  ≙ `regexp_count(text, "\\S+")`
  *   - `n_bpe_tokens` ≙ `regexp_count(text, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")`
  *   - `n_punct`      ≙ `regexp_count(text, "[^A-Za-z0-9\\s]")`
  *
  * Why custom: the r11 100× pass measured t1 at 56.9 s and t2 at
  * 92.5 s — regex NFA passes over ~3 GB of text, one per count (the
  * d6 finding again, at the tokenizer tier). One branch-light byte
  * loop replaces three NFA scans.
  *
  * Equivalence argument (spec-pinned against the regex forms over
  * fixture + adversarial unicode):
  *   - `\s` matches exactly the six ASCII whitespace chars, each a
  *     single byte; every multi-byte UTF-8 unit is non-whitespace.
  *     So char-level runs of `\S` and byte-level runs of non-ws bytes
  *     coincide — `n_ws_tokens` counts byte runs.
  *   - The lexer alternation consumes, per match, a maximal ASCII
  *     letter run, a maximal ASCII digit run, or ONE code point of
  *     anything else (java.util.regex character classes match by code
  *     point, astral chars included). Byte-level: letter/digit runs
  *     are pure ASCII; an "other" code point contributes exactly one
  *     NON-CONTINUATION byte (ASCII other = itself; multi-byte = its
  *     leading byte), so counting non-continuation other bytes counts
  *     other code points.
  *   - `n_punct` is the "other code point" count alone.
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_stats requires a string column, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_ws_tokens", LongType, nullable = false),
    StructField("n_bpe_tokens", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false)))
  override def prettyName: String = "token_stats"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var ws = 0L; var bpe = 0L; var punct = 0L
    // prev class: 0 = whitespace/start, 1 = letter, 2 = digit, 3 = other
    var prev = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val cont = (b & 0xC0) == 0x80 // UTF-8 continuation byte
      val cls =
        if (!cont && ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z'))) 1
        else if (!cont && b >= '0' && b <= '9') 2
        else if (!cont && (b == ' ' || b == '\t' || b == '\n' || b == 0x0B
          || b == '\f' || b == '\r')) 0
        else 3
      if (!cont) {
        if (cls != 0 && prev == 0) ws += 1
        if (cls == 1 && prev != 1) bpe += 1
        if (cls == 2 && prev != 2) bpe += 1
        if (cls == 3) { bpe += 1; punct += 1 }
        prev = cls
      } else if (prev == 0) {
        // defensive: a stray continuation byte with no leader still
        // breaks whitespace for the \S+ count (it IS a non-space char
        // to the regex's replacement-char view) — count the run.
        ws += 1; prev = 3
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](ws, bpe, punct))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val bytes = ctx.freshName("bytes")
      val ws = ctx.freshName("ws"); val bpe = ctx.freshName("bpe")
      val punct = ctx.freshName("punct")
      val prev = ctx.freshName("prev"); val i = ctx.freshName("i")
      val b = ctx.freshName("b"); val cont = ctx.freshName("cont")
      val cls = ctx.freshName("cls")
      // NOTE: no emitted line may START with '|' — the surrounding
      // code-block plumbing margin-strips the final source, and a
      // leading '||' loses its operator (measured: janino "is not a
      // type" on the mangled condition). Operators sit at line ends.
      s"""
         |byte[] $bytes = $in.getBytes();
         |long $ws = 0L; long $bpe = 0L; long $punct = 0L;
         |int $prev = 0;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  byte $b = $bytes[$i];
         |  boolean $cont = ($b & 0xC0) == 0x80;
         |  int $cls;
         |  if (!$cont && (($b >= 'A' && $b <= 'Z') || ($b >= 'a' && $b <= 'z'))) { $cls = 1; }
         |  else if (!$cont && $b >= '0' && $b <= '9') { $cls = 2; }
         |  else if (!$cont && ($b == ' ' || $b == '\\t' || $b == '\\n' ||
         |                      $b == 0x0B || $b == '\\f' || $b == '\\r')) { $cls = 0; }
         |  else { $cls = 3; }
         |  if (!$cont) {
         |    if ($cls != 0 && $prev == 0) { $ws++; }
         |    if ($cls == 1 && $prev != 1) { $bpe++; }
         |    if ($cls == 2 && $prev != 2) { $bpe++; }
         |    if ($cls == 3) { $bpe++; $punct++; }
         |    $prev = $cls;
         |  } else if ($prev == 0) { $ws++; $prev = 3; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{java.lang.Long.valueOf($ws), java.lang.Long.valueOf($bpe),
         |               java.lang.Long.valueOf($punct)});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStatsFunctions {
  /** Idempotently register for both the Column API and spark.sql —
    * once per session (non-retaining memo, see [[Registration]]). */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "token_stats", exprs => TokenStats(exprs(0)))

  /** struct(n_ws_tokens, n_bpe_tokens, n_punct) in one byte pass. */
  def tokenStats(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("token_stats", text)
  }
}
