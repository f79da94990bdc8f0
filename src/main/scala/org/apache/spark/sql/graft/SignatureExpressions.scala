package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native signature computations for the dedup family. Both expressions
  * turn a whole signature pipeline that previously needed a Generate +
  * hash-aggregate exchange (or a 60×|tokens| interpreted nested HOF
  * fold) into ONE narrow per-row pass — signature computation is
  * embarrassingly parallel and at 100 TB should cost zero shuffles;
  * only candidate generation (band/chunk equi-joins) should exchange
  * data. Value equality with the composed Catalyst/SQL formulations is
  * asserted in DedupOpsSpec and by the DuckDB oracles, which reproduce
  * the same md5-based formulas in SQL.
  */
object SignatureExpressions {

  /** Column API: n-seed MinHash signature of a 60-bit shingle-hash array.
    * Null/empty semantics: null input → null; EMPTY input → null (a doc
    * with no shingles has no meaningful signature; callers filter).
    */
  def minhashSig(shingleHashes: Column, n: Int): Column =
    ExpressionUtils.column(
      MinHashSigExpr(ExpressionUtils.expression(shingleHashes), n))

  /** Column API: 60-bit SimHash fingerprint straight from the token
    * array (distinct tokens, md5-seeded per-token hashes, majority vote
    * per bit). Null input → null; empty input → fingerprint 0 (matches
    * the fold-over-empty-list spec).
    */
  def simhashFromTokens(toks: Column): Column =
    ExpressionUtils.column(
      SimHashFromTokensExpr(ExpressionUtils.expression(toks)))
}

/** MinHash signature: for seed i in 0..n-1,
  * `min over shingle hashes h of ((a_i * (h % 2^30) + b_i) % (2^31-1))`
  * — exactly `DedupOps.minhashSigs`' per-(id, i) aggregate, fused into
  * one loop so no posexplode row blow-up and no (id, i) exchange exist
  * at all.
  */
@ExpressionDescription(
  usage = "_FUNC_(shingle_hashes, n) - n-seed MinHash signature")
case class MinHashSigExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"signature length must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigExpr.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val resultCode = (c: String) =>
      s"org.apache.spark.sql.graft.MinHashSigExpr.compute($c, $n)"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = ${resultCode(c)};
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object MinHashSigExpr {
  private val P = 2147483647L // 2^31-1, see DedupOps.MinhashP
  private val Mask30 = (1L << 30) - 1L // h % 2^30 == h & mask for h >= 0

  // Seed arrays are derived from the same portable md5 formula as
  // DedupOps.minhashSeedA/B; memoized per signature length.
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def md5Hash60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  private def seeds(n: Int): (Array[Long], Array[Long]) =
    seedCache.computeIfAbsent(n, { k =>
      (Array.tabulate(k)(i => md5Hash60(s"mh-a:$i") % (P - 1) + 1),
        Array.tabulate(k)(i => md5Hash60(s"mh-b:$i") % P))
    })

  /** Called from generated code (static forwarder). Returns null for an
    * empty shingle set — min over nothing is undefined and such docs
    * must not reach banding.
    */
  def compute(hashes: ArrayData, n: Int): ArrayData = {
    val m = hashes.numElements()
    if (m == 0) return null
    val (a, b) = seeds(n)
    val sig = Array.fill(n)(Long.MaxValue)
    var j = 0
    while (j < m) {
      val h30 = hashes.getLong(j) & Mask30
      var i = 0
      while (i < n) {
        val v = (a(i) * h30 + b(i)) % P
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }
}

/** 60-bit SimHash straight from the token array: per bit j, sum the ±1
  * votes of bit j of each DISTINCT token's seeded 60-bit md5 hash
  * (`"t:" + token`, first 15 hex digits); the fingerprint sets bit j
  * when the vote is positive — exactly `DedupOps.simhash`'s
  * explode → hash → collect → fold pipeline, without the exchange or
  * the 60×|tokens| interpreted fold.
  */
@ExpressionDescription(
  usage = "_FUNC_(toks) - 60-bit SimHash fingerprint of the distinct tokens")
case class SimHashFromTokensExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHashFromTokensExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.SimHashFromTokensExpr.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object SimHashFromTokensExpr {
  private val Bits = 60
  private val Prefix = "t:".getBytes("UTF-8")
  private val Digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Called from generated code (static forwarder). */
  def compute(toks: ArrayData): Long = {
    val n = toks.numElements()
    val md = Digest.get()
    val votes = new Array[Int](Bits)
    val seen = new java.util.HashSet[UTF8String](Math.min(n, 1 << 10))
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null && seen.add(t)) {
        md.reset()
        md.update(Prefix)
        md.update(t.getBytes)
        val d = md.digest()
        var h = 0L
        var bi = 0
        while (bi < 7) { h = (h << 8) | (d(bi) & 0xffL); bi += 1 }
        h = (h << 4) | ((d(7) & 0xf0L) >>> 4)
        var j = 0
        while (j < Bits) {
          votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < Bits) {
      if (votes(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }
}
