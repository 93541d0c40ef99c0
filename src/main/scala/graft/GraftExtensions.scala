package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.{CosineSimilarityD, DotProductLong}

/** SparkSessionExtensions entry point: makes the engine's custom
  * Catalyst expressions available by SQL name in any session built
  * with `.withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * This is the library's injection surface — new optimizer rules or
  * planner strategies (should a future operator need them; SURVEY §4
  * concluded none are required yet) register here too.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[DotProductLong].getName, "dot_long"),
      (es: Seq[Expression]) => DotProductLong(es.head, es(1))))
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarityD].getName, "cosine_sim"),
      (es: Seq[Expression]) => CosineSimilarityD(es.head, es(1))))
  }
}
