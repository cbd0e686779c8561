package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_hashes(text)` — ascending-sorted DISTINCT xxhash64 values of
  * a document's word 3-gram shingles, as one codegen'd expression over
  * the raw `UTF8String` bytes.
  *
  * This is the hot kernel of the whole dedup family (d3/d4/d7 all start
  * from it). The previous form was a `Dataset.map`, which pays an
  * encoder round-trip per row (UnsafeRow → (Long, String) tuple with a
  * UTF-8 → java.lang.String copy → back) and breaks WholeStageCodegen
  * around the scan. As an expression the kernel reads the string's
  * bytes in place, never materializes a shingle STRING at all (word
  * bytes are concatenated into a reused scratch buffer and hashed
  * there), and fuses into the surrounding generated stage.
  *
  * Semantics pinned by the equivalence spec against the readable HOF
  * form: tokens are maximal runs of non-whitespace, where whitespace is
  * Java regex `\s` = { ' ', \t, \n, \x0B, \f, \r } — ASCII-only, so a
  * byte-level scan is exact on any UTF-8 input (multi-byte code points
  * never contain ASCII bytes). Hashes are XXH64(seed 42) over the UTF-8
  * bytes of "w[i] w[i+1] w[i+2]" — bit-identical to Spark's
  * `xxhash64(string)` on the same shingle.
  */
case class ShingleHashArray(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle_hashes requires string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.sortedHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleKernel.sortedHashes($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashArray =
    copy(child = newChild)
}

object ShingleKernel {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Sorted distinct XXH64 hashes of the word 3-gram shingles. */
  def sortedHashes(text: UTF8String): ArrayData = {
    val bytes = text.getBytes // contiguous copy iff the UTF8String is offset-backed
    val n = bytes.length
    // Word boundaries: starts(i) inclusive, ends(i) exclusive.
    var nw = 0
    val starts = new Array[Int](n / 2 + 1)
    val ends = new Array[Int](n / 2 + 1)
    var i = 0
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        starts(nw) = i
        while (i < n && !isWs(bytes(i))) i += 1
        ends(nw) = i
        nw += 1
      }
    }
    if (nw < 3) return UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    // Hash each 3-gram from a reused scratch buffer: w[i] ' ' w[i+1] ' ' w[i+2].
    val scratch = new Array[Byte](n + 2)
    val hs = new Array[Long](nw - 2)
    var k = 0
    while (k < nw - 2) {
      var len = 0
      var g = 0
      while (g < 3) {
        if (g > 0) { scratch(len) = ' '; len += 1 }
        val s = starts(k + g); val e = ends(k + g)
        System.arraycopy(bytes, s, scratch, len, e - s)
        len += e - s
        g += 1
      }
      hs(k) = XXH64.hashUnsafeBytes(scratch, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      k += 1
    }
    // Sort, dedup in place.
    java.util.Arrays.sort(hs)
    var u = 1
    var j = 1
    while (j < hs.length) {
      if (hs(j) != hs(u - 1)) { hs(u) = hs(j); u += 1 }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (u == hs.length) hs else java.util.Arrays.copyOf(hs, u))
  }
}

object ShingleFunctions {
  /** Idempotently register for both the Column API and spark.sql —
    * once per session (non-retaining memo, see [[Registration]]). */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "shingle_hashes",
      exprs => ShingleHashArray(exprs(0)))

  /** Sorted distinct 3-gram shingle hashes of a string column. */
  def shingleHashes(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("shingle_hashes", text)
  }
}
