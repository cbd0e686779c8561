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

/** Fused stopword-ratio kernel: ONE byte pass computing the two counts
  * the quality-scoring tier (t2/t5/pipe1) spelled as a tokenize + an
  * interpreted higher-order filter —
  *
  *   n_tok  ≙ size(filter(split(text, "\\s+"), w => w != ""))
  *   n_stop ≙ size(filter(words, w => w.isin(the,a,of,and,is,to,in)))
  *
  * Why custom (r13): the stopword filter's lambda predicate evaluates
  * per TOKEN outside whole-stage codegen (the interpreted-HOF trap the
  * t4/t23 rewrites measured), and the quality score is computed once
  * per corpus row in three separate queries. Equivalence argument
  * (spec-pinned against the expression forms over fixture + adversarial
  * unicode + fuzz):
  *   - tokens are maximal runs of non-whitespace BYTES — `\s` is the six
  *     ASCII whitespace chars, every multi-byte UTF-8 unit is
  *     non-whitespace, so byte runs and `split("\\s+")` tokens coincide
  *     (the TokenStats n_ws_tokens argument, already pinned since r11);
  *   - a token matches a stopword iff its bytes equal one of the seven
  *     ASCII literals exactly (`isin` is exact, case-sensitive); a run
  *     containing any non-ASCII byte can never equal an ASCII literal,
  *     so byte comparison is exact.
  */
object StopwordKernel {
  // t2/t5/pipe1's list (operators.TextAnalysis.Stopwords), as bytes.
  private val Words: Array[Array[Byte]] =
    Array("the", "a", "of", "and", "is", "to", "in")
      .map(_.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  private def isStop(b: Array[Byte], from: Int, until: Int): Boolean = {
    val n = until - from
    if (n > 3) return false
    var w = 0
    while (w < Words.length) {
      val cand = Words(w)
      if (cand.length == n) {
        var i = 0
        while (i < n && b(from + i) == cand(i)) i += 1
        if (i == n) return true
      }
      w += 1
    }
    false
  }

  def compute(t: UTF8String): InternalRow = {
    val b = t.getBytes
    var nTok = 0L; var nStop = 0L
    var i = 0
    val n = b.length
    while (i < n) {
      if (!isWs(b(i))) {
        val start = i
        while (i < n && !isWs(b(i))) i += 1
        nTok += 1
        if (isStop(b, start, i)) nStop += 1
      } else i += 1
    }
    new GenericInternalRow(Array[Any](
      java.lang.Long.valueOf(nTok), java.lang.Long.valueOf(nStop)))
  }
}

/** Expression wrapper (the ScrubStats pattern: codegen = one static
  * call into the shared kernel). */
case class StopwordStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"stopword_stats requires a string column, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false)))
  override def prettyName: String = "stopword_stats"

  override def nullSafeEval(input: Any): Any =
    StopwordKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.StopwordKernel.compute($in);")

  override protected def withNewChildInternal(newChild: Expression): StopwordStats =
    copy(child = newChild)
}

object StopwordStatsFunctions {
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "stopword_stats", exprs => StopwordStats(exprs(0)))

  /** struct(n_tok, n_stop) in one byte pass. */
  def stopwordStats(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("stopword_stats", text)
  }
}
