/* Bridge package: custom aggregates use catalyst developer APIs; kept
 * alongside the other graft expressions under org.apache.spark.sql. */
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Mutable buffer mirroring the posexplode twin's per-POSITION
  * accounting, so ragged, empty and null-element inputs degrade the
  * same way: `cnts(i)` counts rows whose array reaches position i
  * (null elements included — they sit in the twin's denominator too);
  * `sums(i)` accumulates the non-null values; `seen(i)` records
  * whether any non-null value arrived (all-null position → null mean
  * element, like sum(NULLs) = NULL). Arrays grow to the longest input. */
final class VectorSumBuffer(
    var sums: Array[Double], var cnts: Array[Long], var seen: Array[Boolean]) {

  private def grow(n: Int): Unit = {
    if (sums == null) {
      sums = new Array[Double](n); cnts = new Array[Long](n); seen = new Array[Boolean](n)
    } else if (n > sums.length) {
      sums = java.util.Arrays.copyOf(sums, n)
      cnts = java.util.Arrays.copyOf(cnts, n)
      seen = java.util.Arrays.copyOf(seen, n)
    }
  }

  def dims: Int = if (sums == null) 0 else sums.length

  def add(arr: ArrayData): Unit = {
    val n = arr.numElements()
    if (n == 0) return // empty array has no positions (explodes to nothing)
    grow(n)
    var i = 0
    while (i < n) {
      cnts(i) += 1
      if (!arr.isNullAt(i)) { sums(i) += arr.getDouble(i); seen(i) = true }
      i += 1
    }
  }

  def mergeIn(o: VectorSumBuffer): Unit = {
    if (o.sums != null) {
      grow(o.sums.length)
      var i = 0
      while (i < o.sums.length) {
        sums(i) += o.sums(i); cnts(i) += o.cnts(i); seen(i) |= o.seen(i)
        i += 1
      }
    }
  }
}

/** Field-wise mean of an array<double> column as ONE aggregate (SURVEY
  * A1 — the reference's `Attributes.add`/`div` mean-combine,
  * `alg/pedestrian/attr/Attributes.java:446-475`).
  *
  * Scale rationale vs the posexplode formulation: the buffer is a
  * fixed-size double[dims] that partial-aggregates MAP-SIDE, so the
  * shuffle carries one (key, dims-doubles) row per key per mapper —
  * the explode path multiplies the pre-shuffle row count by `dims`
  * (125× for attribute vectors) and re-assembles with a second
  * aggregation + sort. One shuffle, no row multiplication, no
  * collect_list.
  */
case class VectorMean(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorSumBuffer] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "vector_mean"

  override def createAggregationBuffer(): VectorSumBuffer =
    new VectorSumBuffer(null, null, null)

  override def update(b: VectorSumBuffer, input: InternalRow): VectorSumBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[ArrayData])
    b
  }

  override def merge(b: VectorSumBuffer, o: VectorSumBuffer): VectorSumBuffer = {
    b.mergeIn(o); b
  }

  /** One divergence from the exploded twin, on purpose: a group whose
    * arrays are all null/empty still yields a row (with a null mean)
    * here, where the twin's post-explode grouping drops the key. */
  override def eval(b: VectorSumBuffer): Any =
    if (b.dims == 0) null
    else {
      val out = new Array[Any](b.dims)
      var i = 0
      while (i < b.dims) {
        out(i) = if (b.seen(i)) b.sums(i) / b.cnts(i) else null
        i += 1
      }
      new GenericArrayData(out)
    }

  override def serialize(b: VectorSumBuffer): Array[Byte] = {
    val dims = b.dims
    val buf = ByteBuffer.allocate(4 + dims * (8 + 8 + 1))
    buf.putInt(dims)
    var i = 0
    while (i < dims) {
      buf.putDouble(b.sums(i)); buf.putLong(b.cnts(i))
      buf.put(if (b.seen(i)) 1.toByte else 0.toByte)
      i += 1
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorSumBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val dims = buf.getInt
    if (dims == 0) new VectorSumBuffer(null, null, null)
    else {
      val sums = new Array[Double](dims)
      val cnts = new Array[Long](dims)
      val seen = new Array[Boolean](dims)
      var i = 0
      while (i < dims) {
        sums(i) = buf.getDouble; cnts(i) = buf.getLong; seen(i) = buf.get() == 1
        i += 1
      }
      new VectorSumBuffer(sums, cnts, seen)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMean =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMean =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorMean =
    copy(child = newChildren.head)
}

/** Exact element-wise SUM of array<long> vectors + row count, as one
  * map-side-combining aggregate — the k-means centroid-update shape
  * (integer-exact so the DuckDB oracle matches bit-for-bit; the mean
  * is taken by the caller with an explicit, engine-portable floor
  * division). Requires equal-length inputs (quantized vectors are). */
final class LongSumBuffer(var n: Long, var sums: Array[Long]) {
  def add(arr: ArrayData): Unit = {
    val len = arr.numElements()
    if (sums == null) sums = new Array[Long](len)
    require(len == sums.length,
      s"vector_sum_long: mixed vector lengths ($len vs ${sums.length})")
    var i = 0
    while (i < len) { sums(i) += arr.getLong(i); i += 1 }
    n += 1
  }
  def mergeIn(o: LongSumBuffer): Unit = {
    if (o.sums != null) {
      if (sums == null) sums = new Array[Long](o.sums.length)
      require(o.sums.length == sums.length,
        s"vector_sum_long: mixed vector lengths (${o.sums.length} vs ${sums.length})")
      var i = 0
      while (i < sums.length) { sums(i) += o.sums(i); i += 1 }
    }
    n += o.n
  }
}

case class VectorSumLong(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongSumBuffer] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(LongType, containsNull = false)),
    StructField("n", LongType)))
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "vector_sum_long"

  override def createAggregationBuffer(): LongSumBuffer = new LongSumBuffer(0L, null)

  override def update(b: LongSumBuffer, input: InternalRow): LongSumBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[ArrayData])
    b
  }

  override def merge(b: LongSumBuffer, o: LongSumBuffer): LongSumBuffer = {
    b.mergeIn(o); b
  }

  override def eval(b: LongSumBuffer): Any =
    if (b.sums == null) null
    else InternalRow(new GenericArrayData(b.sums), b.n)

  override def serialize(b: LongSumBuffer): Array[Byte] = {
    val dims = if (b.sums == null) 0 else b.sums.length
    val buf = ByteBuffer.allocate(8 + 4 + 8 * dims)
    buf.putLong(b.n)
    buf.putInt(dims)
    var i = 0
    while (i < dims) { buf.putLong(b.sums(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): LongSumBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getLong
    val dims = buf.getInt
    val sums = if (dims == 0) null else {
      val a = new Array[Long](dims)
      var i = 0
      while (i < dims) { a(i) = buf.getLong; i += 1 }
      a
    }
    new LongSumBuffer(n, sums)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorSumLong =
    copy(child = newChildren.head)
}

object VectorMeanAgg {
  /** Field-wise mean of an array-of-double column (map-side combining
    * TypedImperativeAggregate; input cast to array<double>). */
  def vector_mean(vec: Column): Column =
    ExpressionUtils.column(
      VectorMean(ExpressionUtils.expression(vec.cast("array<double>")))
        .toAggregateExpression())

  /** Exact element-wise long sums + count: struct(sums array<long>,
    * n long). */
  def vector_sum_long(vec: Column): Column =
    ExpressionUtils.column(
      VectorSumLong(ExpressionUtils.expression(vec))
        .toAggregateExpression())
}
