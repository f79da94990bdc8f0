package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native AGGREGATE extension: the HyperLogLog register table as one
  * `TypedImperativeAggregate` buffer instead of a groupBy(bucket)
  * relational plan. Same sketch as `SketchOps.hllRegisters` +
  * `hllSummary` — same 60-bit md5 hash, same rho, same raw estimator,
  * bit-identical estimate (spec- and oracle-pinned) — but the state is
  * a 4096-byte array per partial, so the whole distinct-count costs ONE
  * aggregation with no register-table shuffle at all: each partition
  * reduces to its own 4 KB buffer, buffers merge by elementwise max on
  * the driver side of the exchange, and a single double comes out.
  *
  * This is the third Catalyst extension class the engine demonstrates:
  * scalar expressions (hash/signature/JSON families), generators-by-
  * composition, and now a custom aggregation function with real
  * partial/merge semantics — the (b)-preference route for operator
  * semantics Spark's built-ins don't carry (`approx_count_distinct`'s
  * HLL++ registers are engine-specific; this one is portable).
  */
object SketchAggregates {

  /** Column API: raw-HLL distinct estimate of the (pre-seeded) string
    * key. Pass the SAME string you would hash in the relational form
    * (e.g. `concat(lit("hll:"), key.cast("string"))`) — the aggregate
    * hashes internally with the shared md5-prefix digest.
    */
  def hllEstimate(c: Column): Column =
    ExpressionUtils.column(
      HllSketchAgg(ExpressionUtils.expression(c))
        .toAggregateExpression())

  /** Column API: KMV bottom-k distinct estimate of the (pre-seeded)
    * string key — EXACT whenever the input has fewer than k distinct
    * hashes (the bottom-k set then holds every one of them), ~1/√k
    * relative error above. The profiling counterpart of
    * [[hllEstimate]]: the log-free raw HLL estimator saturates at
    * ≈2954 on tiny cardinalities (no linear-counting correction
    * without libm), where KMV's exact-under-k regime is what a
    * per-column profile actually wants.
    */
  def kmvEstimate(c: Column, k: Int): Column =
    ExpressionUtils.column(
      KmvSketchAgg(ExpressionUtils.expression(c), k)
        .toAggregateExpression())
}

@ExpressionDescription(
  usage = "_FUNC_(str) - raw-HLL distinct estimate over md5-hashed keys")
case class HllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with ExpectsInputTypes {

  import HllSketchAgg._

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  // null on zero rows seen — matching the relational form, whose
  // sum-over-empty-registers is null (the raw estimator would otherwise
  // report alpha*m ≈ 2954 distinct keys for an EMPTY input)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](Buckets) // rho per bucket; rho <= 49 fits a byte

  override def update(buf: Array[Byte], input: org.apache.spark.sql
      .catalyst.InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = Md5Prefix60Expr.compute(v.asInstanceOf[UTF8String])
      val bucket = (h % Buckets).toInt
      val w = h >>> Precision // 48 bits
      val rho = if (w == 0L) 49 else 49 - (64 - java.lang.Long
        .numberOfLeadingZeros(w))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < Buckets) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    // identical fixed-point estimator to SketchOps.hllSummary: present
    // buckets contribute 2^(50-rho), absent ones 2^50, all exact longs;
    // then one literal-only double expression. An all-zero buffer means
    // ZERO rows updated it (any seen key sets its bucket's rho to >= 1),
    // and the estimator is meaningless there — null, like the
    // relational form.
    var fxSum = 0L
    var seen = false
    var i = 0
    while (i < Buckets) {
      val rho = buf(i)
      if (rho != 0) seen = true
      fxSum += (if (rho == 0) 1L << 50 else 1L << (50 - rho))
      i += 1
    }
    if (!seen) return null
    val m = Buckets.toDouble
    val alphaM = 0.7213 / (1.0 + 1.079 / m)
    alphaM * m * m * (1L << 50).toDouble / fxSum.toDouble
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object HllSketchAgg {
  /** Must mirror SketchOps.HllPrecision/HllBuckets — the estimate is
    * oracle-compared against the relational form's, so the two cannot
    * drift (the cross-check is the sk6 correctness gate itself).
    */
  val Precision: Int = 12
  val Buckets: Int = 1 << Precision
}

/** KMV bottom-k sketch as a `TypedImperativeAggregate`: the buffer is
  * the set of the k smallest distinct 60-bit md5 hashes seen so far
  * (≤ 8k bytes serialized), partials merge by re-taking the bottom k
  * of the union — the same merge law `SketchOpsSpec` pins for the
  * relational sketch — and the estimator is `SketchOps.kmvSummary`'s:
  * exact size under k distinct hashes, else (k−1)·2^60 / kth-minimum.
  * Zero non-null rows yield 0.0 (zero distinct is exact, unlike HLL's
  * meaningless empty-register estimate — hence no null case here).
  */
@ExpressionDescription(
  usage = "_FUNC_(str, k) - KMV bottom-k distinct estimate, exact under k")
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with ExpectsInputTypes {

  require(k > 0, s"kmv_estimate: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: org.apache.spark.sql.catalyst.InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = Md5Prefix60Expr.compute(v.asInstanceOf[UTF8String])
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { // strict: equal-to-max is a known hash
        buf.add(h)
        if (buf.size > k) buf.pollLast()
      }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    a.addAll(b)
    while (a.size > k) a.pollLast()
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * 1.152921504606846976e18 /
      buf.last().toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long])
      : Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
