package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two double arrays.
  *
  * This is the one place profiling justified a custom Catalyst
  * `Expression` (SURVEY.md §4): the higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is interpreted — per
  * element it allocates lambda variables and boxes doubles, which
  * dominates brute-force similarity scans (millions of pairs × vector
  * dim). The generated code below is a tight primitive loop.
  *
  * Semantics are IDENTICAL to the HOF fold — strict left-to-right
  * accumulation of `a(i) * b(i)` into a double starting at 0.0 — so
  * results are bit-for-bit the same and the DuckDB oracle's
  * `list_reduce` fold still hash-matches. Null if either input is null
  * (like every binary expression) OR if any *element* is null — the HOF
  * fold yields null there (`acc + null` poisons the fold), and a native
  * loop that read a null slot would fold garbage instead. The element
  * check is emitted only when the input types say elements can be null,
  * so non-nullable arrays keep the tight branch-free loop. Unequal
  * lengths fail fast.
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` and the
  * Column↔Expression bridge are `private[sql]` — the usual extension-shim
  * pattern; everything used is public Catalyst API otherwise.
  */
@ExpressionDescription(
  usage = "_FUNC_(a, b) - strict left-fold dot product of two double arrays")
case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  /** Whether either input's type admits null elements (drives both the
    * interpreted and generated null checks — and `nullable`, since a
    * null element nulls the whole result).
    */
  private def elementsNullable: Boolean = Seq(left, right).exists {
    e => e.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }
  }

  override def nullable: Boolean =
    left.nullable || right.nullable || elementsNullable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(y.numElements() == n,
      s"dot product of unequal lengths: $n vs ${y.numElements()}")
    val checkNulls = elementsNullable
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (elementsNullable)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) {
             |    ${ev.isNull} = true; break;
             |  }""".stripMargin
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "dot product of unequal lengths: " + $n + " vs " +
         |    $b.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object VectorExpressions {
  /** Column API for the native dot product. */
  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProductDouble(ExpressionUtils.expression(a),
        ExpressionUtils.expression(b)))
}
