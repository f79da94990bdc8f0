package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Two more native `TypedImperativeAggregate`s, both chosen because the
  * relational alternative shuffles data volume proportional to the INPUT
  * while the aggregate's partial state is a small constant:
  *
  *  - [[GramMatrixAgg]] — the upper triangle of Xᵀ·X over fixed-point
  *    vector components: the single-pass building block for covariance /
  *    PCA / whitening of an embedding corpus. Relationally this is
  *    explode(d²)→groupBy — a d²-per-row blowup into the shuffle; here
  *    each partition folds into one `d(d+1)/2`-long array (~16 KB at
  *    d=64) and partials merge by elementwise add. At 100 TB the map
  *    side does all the work and the exchange moves kilobytes.
  *  - [[TopKAgg]] — bounded per-group top-k as a size-k min-heap.
  *    The window form (`row_number() OVER (... ORDER BY v DESC) <= k`)
  *    sorts EVERY row of every group behind one shuffle; the heap keeps
  *    k doubles per partition per group, so the exchange carries at most
  *    k values per (partition, group) and nothing is ever globally
  *    sorted.
  *
  * Fixed-point exactness (gram): components floor to `x·scale` longs, so
  * products and sums are exact integers — bit-identical across engines,
  * which is what lets a DuckDB oracle hash-match a 2080-cell matrix.
  * Overflow is LOUD (`Math.multiplyExact`/`addExact` throw) rather than
  * silently wrapping: at the default scale 10⁶ and unit-normalized
  * components the budget is ~10¹² per row pair-product, i.e. ~10⁶ rows
  * per partition before a cell could reach 2⁶³ — re-scale for corpora
  * beyond that.
  */
object AnalyticsAggregates {

  /** Column API: upper-triangle fixed-point Gram matrix (length
    * dim·(dim+1)/2, row-major by (i, j≥i)) of an array&lt;double&gt;
    * column. Cell t(i,j) = Σ_rows floor(vᵢ·scale)·floor(vⱼ·scale).
    */
  def gramFx(c: Column, dim: Int, scale: Double): Column =
    ExpressionUtils.column(
      GramMatrixAgg(ExpressionUtils.expression(c), dim, scale)
        .toAggregateExpression())

  /** Column API: the k largest values of a double column, sorted
    * descending (a multiset of values — duplicates retained).
    */
  def topK(c: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKAgg(ExpressionUtils.expression(c), k).toAggregateExpression())
}

@ExpressionDescription(
  usage = "_FUNC_(vec, dim, scale) - fixed-point upper-triangle Gram matrix")
case class GramMatrixAgg(
    child: Expression,
    dim: Int,
    scale: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  require(dim > 0, s"gram_fx: dim must be positive, got $dim")
  require(scale > 0, s"gram_fx: scale must be positive, got $scale")

  private val tri = dim * (dim + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  // zero rows -> the all-zero matrix (the empty sum), never null
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](tri)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      // loud on ragged input: a silent skip would bias the matrix
      require(arr.numElements() == dim,
        s"gram_fx: expected dim=$dim components, got ${arr.numElements()}")
      val fx = new Array[Long](dim)
      var i = 0
      while (i < dim) {
        fx(i) = math.floor(arr.getDouble(i) * scale).toLong
        i += 1
      }
      var t = 0
      i = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          buf(t) = Math.addExact(buf(t), Math.multiplyExact(fx(i), fx(j)))
          t += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var t = 0
    while (t < tri) {
      a(t) = Math.addExact(a(t), b(t))
      t += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * tri)
    var t = 0
    while (t < tri) { bb.putLong(buf(t)); t += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](tri)
    var t = 0
    while (t < tri) { out(t) = bb.getLong; t += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Bounded top-k: the buffer is a size-k min-heap of doubles; a value
  * enters only if the heap is under k or it beats the current minimum,
  * partials merge by folding one heap into the other. NaNs are skipped
  * on entry (a NaN would poison heap ordering AND diverge from SQL
  * engines, which exclude NULL/NaN from ordered aggregates differently).
  */
@ExpressionDescription(
  usage = "_FUNC_(v, k) - the k largest values, sorted descending")
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Double]]
    with ExpectsInputTypes {

  require(k > 0, s"top_k: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  // zero rows -> empty array, never null
  override def nullable: Boolean = false

  override def createAggregationBuffer()
      : java.util.PriorityQueue[java.lang.Double] =
    new java.util.PriorityQueue[java.lang.Double](k + 1)

  private def offer(heap: java.util.PriorityQueue[java.lang.Double],
      d: Double): Unit = {
    if (!java.lang.Double.isNaN(d)) {
      if (heap.size < k) heap.add(d)
      else if (d > heap.peek()) {
        heap.poll()
        heap.add(d)
      }
    }
  }

  override def update(heap: java.util.PriorityQueue[java.lang.Double],
      input: InternalRow): java.util.PriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) offer(heap, v.asInstanceOf[Double])
    heap
  }

  override def merge(a: java.util.PriorityQueue[java.lang.Double],
      b: java.util.PriorityQueue[java.lang.Double])
      : java.util.PriorityQueue[java.lang.Double] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(heap: java.util.PriorityQueue[java.lang.Double]): Any = {
    // copy out without disturbing the buffer (Spark may reuse it)
    val n = heap.size
    val out = new Array[Double](n)
    val it = heap.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    // descending
    var lo = 0
    var hi = n - 1
    while (lo < hi) {
      val t = out(lo); out(lo) = out(hi); out(hi) = t
      lo += 1; hi -= 1
    }
    new GenericArrayData(out)
  }

  override def serialize(heap: java.util.PriorityQueue[java.lang.Double])
      : Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * heap.size)
    bb.putInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) bb.putDouble(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.PriorityQueue[java.lang.Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = new java.util.PriorityQueue[java.lang.Double](k + 1)
    var i = 0
    while (i < n) { heap.add(bb.getDouble); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
