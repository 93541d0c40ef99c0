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

/** Mutable buffer: element-wise running sums + row count. Dims are
  * locked in by the first non-null vector seen. */
final class VectorSumBuffer(var count: Long, var sums: Array[Double]) {
  def add(arr: ArrayData): Unit = {
    val n = arr.numElements()
    if (sums == null) sums = new Array[Double](n)
    require(n == sums.length,
      s"vector_mean: mixed vector lengths ($n vs ${sums.length})")
    var i = 0
    while (i < n) { sums(i) += arr.getDouble(i); i += 1 }
    count += 1
  }
  def mergeIn(o: VectorSumBuffer): Unit = {
    if (o.sums != null) {
      if (sums == null) sums = new Array[Double](o.sums.length)
      require(o.sums.length == sums.length,
        s"vector_mean: mixed vector lengths (${o.sums.length} vs ${sums.length})")
      var i = 0
      while (i < sums.length) { sums(i) += o.sums(i); i += 1 }
    }
    count += o.count
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
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "vector_mean"

  override def createAggregationBuffer(): VectorSumBuffer =
    new VectorSumBuffer(0L, null)

  override def update(b: VectorSumBuffer, input: InternalRow): VectorSumBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[ArrayData])
    b
  }

  override def merge(b: VectorSumBuffer, o: VectorSumBuffer): VectorSumBuffer = {
    b.mergeIn(o); b
  }

  override def eval(b: VectorSumBuffer): Any =
    if (b.count == 0 || b.sums == null) null
    else {
      val out = new Array[Double](b.sums.length)
      var i = 0
      while (i < out.length) { out(i) = b.sums(i) / b.count; i += 1 }
      new GenericArrayData(out)
    }

  override def serialize(b: VectorSumBuffer): Array[Byte] = {
    val dims = if (b.sums == null) 0 else b.sums.length
    val buf = ByteBuffer.allocate(8 + 4 + 8 * dims)
    buf.putLong(b.count)
    buf.putInt(dims)
    var i = 0
    while (i < dims) { buf.putDouble(b.sums(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorSumBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val count = buf.getLong
    val dims = buf.getInt
    val sums = if (dims == 0) null else {
      val a = new Array[Double](dims)
      var i = 0
      while (i < dims) { a(i) = buf.getDouble; i += 1 }
      a
    }
    new VectorSumBuffer(count, sums)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMean =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMean =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): VectorMean =
    copy(child = newChildren.head)
}

object VectorMeanAgg {
  /** Field-wise mean of an array-of-double column (map-side combining
    * TypedImperativeAggregate; input cast to array<double>). */
  def vector_mean(vec: Column): Column =
    ExpressionUtils.column(
      VectorMean(ExpressionUtils.expression(vec.cast("array<double>")))
        .toAggregateExpression())
}
