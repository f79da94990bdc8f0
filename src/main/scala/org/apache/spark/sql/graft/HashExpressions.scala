package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit portable content hash — the engine's universal seeded
  * hash (`TextOps.md5Prefix60`), fused into one digest call.
  *
  * The composed Catalyst form `conv(substring(md5(c), 1, 15), 16, 10)`
  * pays three avoidable string passes per row on top of the digest: the
  * md5 expression renders the 16-byte digest to a 32-char hex string,
  * substring copies 15 chars of it, and conv parses those chars back
  * into a long (via an intermediate decimal STRING that the final cast
  * parses AGAIN). The first 15 hex digits ARE the first 60 bits of the
  * digest, so this expression reads them directly: digest → first 8
  * bytes big-endian → `>>> 4`. Value equality with the composed form is
  * property-tested (Md5Prefix60PropertySpec) and every DuckDB oracle
  * replicates the same formula in SQL, so the cross-engine gate pins it
  * too. Used by every md5-seeded query family (splits, samples,
  * sketches, shingles, stratification) — sk1/sk2 digest ~600k rows each
  * at sf0.1, making the per-row string churn measurable.
  */
object HashExpressions {

  /** Column API: first 60 bits of md5(str) as BIGINT (null → null). */
  def md5Prefix60(c: Column): Column =
    ExpressionUtils.column(Md5Prefix60Expr(ExpressionUtils.expression(c)))
}

@ExpressionDescription(
  usage = "_FUNC_(str) - first 60 bits of md5(str) as BIGINT")
case class Md5Prefix60Expr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.Md5Prefix60Expr.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object Md5Prefix60Expr {
  // MessageDigest is stateful; one instance per task thread, reset per
  // row. getInstance per row would dominate (provider lookup).
  private val md = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(UTF-8 bytes of s), as an unsigned long —
    * bit-identical to `conv(substring(md5(s), 1, 15), 16, 10)`: the
    * first 15 hex digits of the digest are its first 60 bits, i.e. the
    * big-endian first 8 bytes shifted right by one nibble.
    */
  def compute(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
