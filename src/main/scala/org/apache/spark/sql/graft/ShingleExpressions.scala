package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct-shingle hashing: token array → array of 60-bit hashes
  * of the document's DISTINCT word k-shingles, in one pass.
  *
  * Semantically identical to the composed Catalyst pipeline it replaces
  * (`DedupOps.shingles` + `hash60`, i.e.
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ", slice(toks,
  * i+1, k))))` each hashed as the first 15 md5 hex digits of
  * `"sh:" + shingle`) — DedupOpsSpec asserts value equality, and the
  * DuckDB oracle reproduces the same formula in SQL.
  *
  * Why native: the HOF formulation is interpreted — per window it
  * allocates lambda variables, a slice array, and a concat, and
  * `array_distinct` rescans; profiling showed this interpreted
  * shingle+md5 path as the dominant constant of the Jaccard near-dup
  * query (~10× over the same pipeline in a native engine). Here the
  * whole thing is one tight loop over UTF8String windows with a reused
  * thread-local MessageDigest, and the call participates in whole-stage
  * codegen via a static method (the loop body is opaque to Catalyst but
  * the surrounding projection stays fused).
  *
  * Shim-package placement: `AbstractDataType` and the Column↔Expression
  * bridge are `private[sql]` (see [[VectorExpressions]]).
  */
@ExpressionDescription(
  usage = "_FUNC_(toks, k) - 60-bit md5 hashes of the distinct word k-shingles")
case class ShingleHash60Expr(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, s"shingle size must be >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash60.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ShingleHash60.compute($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object ShingleHash60 {
  private val Prefix = "sh:".getBytes("UTF-8")
  private val Space = UTF8String.fromString(" ")
  private val Digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5("sh:" + shingle) — numerically equal to
    * `conv(substr(md5(x), 1, 15), 16, 10)`: 14 hex digits are bytes 0–6,
    * the 15th is the high nibble of byte 7.
    */
  private def hash60(sh: UTF8String, md: MessageDigest): Long = {
    md.reset()
    md.update(Prefix)
    md.update(sh.getBytes)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Called from generated code (static forwarder). */
  def compute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val md = Digest.get()
    val seen = new java.util.HashSet[UTF8String](Math.min(n, 1 << 10))
    val out = new Array[Long](n - k + 1)
    val parts = new Array[UTF8String](k)
    var m = 0
    var i = 0
    while (i + k <= n) {
      var j = 0
      while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      // concatWs skips nulls — same null semantics as the concat_ws spec
      val sh = UTF8String.concatWs(Space, parts: _*)
      if (seen.add(sh)) {
        out(m) = hash60(sh, md)
        m += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}

object ShingleExpressions {
  /** Column API: distinct k-shingle 60-bit hashes of a token array. */
  def shingleHash60(toks: Column, k: Int): Column =
    ExpressionUtils.column(
      ShingleHash60Expr(ExpressionUtils.expression(toks), k))
}
