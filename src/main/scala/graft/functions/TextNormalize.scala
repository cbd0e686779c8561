package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Dedup-normalization kernel: collapse a (pre-lowercased) string to
  * its `[a-z0-9]+` runs joined by single spaces — byte-for-byte the
  * result of the classic two-regex pipeline
  * `trim(regexp_replace(regexp_replace(s, "[^a-z0-9\\s]", " "), "\\s+", " "))`,
  * in ONE allocation-free byte pass.
  *
  * Why custom: the r11 100× full-catalog pass measured d6 (normalized
  * exact dedup) at 67 s — almost all of it the two java.util.regex
  * passes over ~3 GB of document text (each pass NFA-matches per
  * character and materializes an intermediate string). At the 100 TB
  * posture that kernel IS the query; a linear byte loop with no
  * intermediate copies is the difference between a dedup pass and a
  * regex farm. Equivalence argument (spec-pinned against the regex
  * form): every byte outside [a-z0-9] — ASCII whitespace, punctuation,
  * OR any byte of a multi-byte UTF-8 sequence — is a separator under
  * BOTH forms (the regex maps each non-matching CHAR to a space and
  * then collapses runs; mapping each non-matching BYTE to a separator
  * collapses to the same single space), and leading/trailing
  * separators vanish under both (trim ≙ no space before the first or
  * after the last run).
  */
case class DedupNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dedup_normalize requires a string column, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "dedup_normalize"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val out = new Array[Byte](bytes.length)
    var o = 0
    var sep = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (sep && o > 0) { out(o) = ' '; o += 1 }
        sep = false
        out(o) = b
        o += 1
      } else sep = true
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val bytes = ctx.freshName("bytes")
      val out = ctx.freshName("out")
      val o = ctx.freshName("o")
      val sep = ctx.freshName("sep")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
         |byte[] $bytes = $in.getBytes();
         |byte[] $out = new byte[$bytes.length];
         |int $o = 0;
         |boolean $sep = false;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  byte $b = $bytes[$i];
         |  if (($b >= 'a' && $b <= 'z') || ($b >= '0' && $b <= '9')) {
         |    if ($sep && $o > 0) { $out[$o++] = ' '; }
         |    $sep = false;
         |    $out[$o++] = $b;
         |  } else { $sep = true; }
         |}
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromBytes($out, 0, $o);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): DedupNormalize =
    copy(child = newChild)
}

object TextNormalizeFunctions {
  /** Idempotently register for both the Column API and spark.sql —
    * once per session (non-retaining memo, see [[Registration]]). */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "dedup_normalize",
      exprs => DedupNormalize(exprs(0)))

  /** `[a-z0-9]+` runs of a pre-lowercased string joined by single
    * spaces (the two-regex normalize-collapse-trim pipeline, fused). */
  def dedupNormalize(spark: SparkSession, s: Column): Column = {
    register(spark)
    call_function("dedup_normalize", s)
  }
}
