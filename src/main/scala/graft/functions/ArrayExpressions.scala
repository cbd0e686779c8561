package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Intersection cardinality of two ASCENDING-SORTED `array<bigint>`
  * columns via a linear merge — the verification kernel for the
  * set-similarity joins (Dedup d3/d4/d7).
  *
  * Why custom: `size(array_intersect(a, b))` builds a hash set per
  * row-pair and allocates the materialized intersection array only to
  * count it; with pre-sorted inputs a two-pointer merge is O(|a|+|b|),
  * allocation-free, and codegen-fused into the surrounding stage. The
  * dedup kernels already emit sorted-distinct hash arrays (sortedness
  * is also what the prefix filter needs), so the precondition is free.
  *
  * Precondition: both arrays sorted ascending (duplicates allowed on
  * either side count once per matching advance — inputs here are
  * distinct sets). Unsorted input gives an undercount, never an error;
  * the equivalence spec pins kernel output against `array_intersect`.
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires (array<bigint>, array<bigint>), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi < yj) i += 1
      else if (xi > yj) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xi = ctx.freshName("xi"); val yj = ctx.freshName("yj")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xi = $a.getLong($i); long $yj = $b.getLong($j);
         |  if ($xi < $yj) { $i++; }
         |  else if ($xi > $yj) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

object ArrayFunctions {
  /** Idempotently register for both the Column API and spark.sql —
    * once per session (non-retaining memo, see [[Registration]]). */
  def register(spark: SparkSession): Unit =
    Registration.ensure(spark, "sorted_intersect_count",
      exprs => SortedLongIntersectCount(exprs(0), exprs(1)))

  /** |a ∩ b| for two sorted `array<bigint>` columns. */
  def sortedIntersectCount(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("sorted_intersect_count", a, b)
  }
}
