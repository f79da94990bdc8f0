package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionDescription, RowOrdering}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, ArrayType, LongType}

/** Native codegen'd `upper_bound`: the number of elements of a SORTED
  * (ascending, null-free) array that are ≤ `key` — i.e. the key's
  * range-bucket id against a broadcast boundary list.
  *
  * Why native (SURVEY.md §4 discipline — profiling first): the
  * higher-order-function formulation
  * (`aggregate(bounds, 0L, (acc, b) -> acc + IF(key >= b, 1, 0))`)
  * is `ArrayAggregate`, a CodegenFallback — every row pays an
  * interpreted 255-step fold with boxed lambda variables AND breaks
  * the surrounding whole-stage-codegen span. Measured on g11_pareto
  * at sf0.1: the fold alone is ~2.0 s of the query's 2.6 s. This
  * expression is a tight generated binary search (≤8 comparisons for
  * 255 bounds) that stays inside the codegen span.
  *
  * Semantics equal the fold's ONLY under the documented precondition
  * (array sorted ascending, elements non-null — exactly what
  * `RelationalOps.withRangeBuckets` constructs: a sorted, null-filtered,
  * thinned boundary sample). Ties are safe by construction: equal keys
  * get equal counts, so a tie group can never split across buckets.
  * Null array or null key → null (callers wrap in `coalesce(·, 0)`,
  * matching the fold's null-poisoning → bucket 0 behavior). Works for
  * any ordered element type — numeric keys and d18's string blocking
  * keys alike — via Catalyst's own comparator (`ctx.genComp` /
  * `TypeUtils.getInterpretedOrdering`).
  */
@ExpressionDescription(
  usage = "_FUNC_(sorted_bounds, key) - count of sorted-array elements <= key")
case class SortedLowerBoundCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(et, _)
        if RowOrdering.isOrderable(et) && et.sameType(right.dataType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"requires (array<T>, T) with orderable T, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elemType)

  override protected def nullSafeEval(a: Any, k: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    var lo = 0
    var hi = arr.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ordering.compare(arr.get(mid, elemType), k) <= 0) lo = mid + 1
      else hi = mid
    }
    lo.toLong
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, k) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val v = ctx.freshName("v")
      val jt = CodeGenerator.javaType(elemType)
      s"""
         |int $lo = 0;
         |int $hi = $a.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  $jt $v = ${CodeGenerator.getValue(a, elemType, mid)};
         |  if (${ctx.genComp(elemType, v, k)} <= 0) $lo = $mid + 1;
         |  else $hi = $mid;
         |}
         |${ev.value} = (long) $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object SearchExpressions {
  /** Column API: bucket id of `key` against a sorted boundary array. */
  def sortedLowerBoundCount(bounds: Column, key: Column): Column =
    ExpressionUtils.column(
      SortedLowerBoundCount(ExpressionUtils.expression(bounds),
        ExpressionUtils.expression(key)))
}
