/* Bridge package: Spark 4 marks AbstractDataType / ExpressionUtils as
 * private[sql], so custom Catalyst expressions live in a subpackage of
 * org.apache.spark.sql (the standard extension pattern). Public API is
 * re-exported through graft.functions.VectorFunctions. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the vector-similarity kernels
  * (SURVEY X4 — the comparer hot path, reference
  * `alg/pedestrian/reid/PedestrianComparerUsingAttr.java:30-41`).
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) express
  * these correctly but evaluate interpreted, one lambda dispatch per
  * element. These expressions generate a tight primitive loop inside
  * whole-stage codegen instead (`doGenCode`) — the preferred extension
  * order from the build brief: compose built-ins first, custom
  * `Expression` when the hot path justifies it.
  */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity over two array<double> columns, single pass
  * (dot, |a|², |b|² accumulated together), codegen'd. */
case class CosineSimilarityD(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xv = $a.getDouble($i);
         |  final double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityD =
    copy(left = newLeft, right = newRight)
}

/** Deterministic attribute-vector generator: element d of the result is
  * `((id * (31 + 2d) + (7 + d)) % 997) / 997.0` — exactly the value the
  * composed form `array(fakeScore(id, 0), ..., fakeScore(id, dims-1))`
  * produces (parity-checked in OperatorsSpec). The composed form's
  * codegen emits 128 straight-line sub-expressions whose enclosing
  * method exceeds HotSpot's JIT bytecode ceiling, so the hot loop ran
  * INTERPRETED at reference width (measured ~23 µs/row); this loop
  * form stays a few hundred bytes and vectorizes. Null id → null
  * array (the generator is only applied to non-null key columns). */
case class FakeAttrVector(child: Expression, dims: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "fake_attr_vector"

  override def nullSafeEval(input: Any): Any = {
    val id = input.asInstanceOf[Long]
    val arr = new Array[Double](dims)
    var d = 0
    while (d < dims) {
      arr(d) = ((id * (31L + 2L * d) + (7L + d)) % 997L).toDouble / 997.0
      d += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, id => {
      val arr = ctx.freshName("arr")
      val d = ctx.freshName("d")
      s"""
         |final double[] $arr = new double[$dims];
         |for (int $d = 0; $d < $dims; $d++) {
         |  $arr[$d] = (double) (($id * (31L + 2L * $d) + (7L + $d)) % 997L) / 997.0;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FakeAttrVector =
    copy(child = newChild)
}

object VectorExpressions {
  /** Exact integer dot product (codegen'd). Inputs: array<long>. */
  def dot_long(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductLong(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Cosine similarity (codegen'd). Inputs cast to array<double>. */
  def cosine_sim(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarityD(
      ExpressionUtils.expression(a.cast("array<double>")),
      ExpressionUtils.expression(b.cast("array<double>"))))

  /** Deterministic attribute vector (codegen'd loop). Input cast to
    * long; `dims` fixed at plan time. */
  def fake_attrs(id: Column, dims: Int): Column =
    ExpressionUtils.column(FakeAttrVector(
      ExpressionUtils.expression(id.cast("long")), dims))

  /** Register SQL names (`dot_long`, `cosine_sim`) on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "dot_long", es => DotProductLong(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "cosine_sim", es => CosineSimilarityD(es.head, es(1)), "built-in")
  }
}
