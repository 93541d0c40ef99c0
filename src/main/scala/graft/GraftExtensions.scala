package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.{ContentFingerprint, CosineSimilarityD, DotProductLong, L2SqLong, MinHashSigs, ShingleHash32, SimHash32, TokenHash32, VectorMean}

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
    e.injectFunction((
      new FunctionIdentifier("l2sq_long"),
      new ExpressionInfo(classOf[L2SqLong].getName, "l2sq_long"),
      (es: Seq[Expression]) => L2SqLong(es.head, es(1))))
    // k must be a foldable integer literal (shingle width)
    e.injectFunction((
      new FunctionIdentifier("shingle_hash32"),
      new ExpressionInfo(classOf[ShingleHash32].getName, "shingle_hash32"),
      (es: Seq[Expression]) =>
        ShingleHash32(es.head, es(1).eval().asInstanceOf[Number].intValue())))
    e.injectFunction((
      new FunctionIdentifier("token_hash32"),
      new ExpressionInfo(classOf[TokenHash32].getName, "token_hash32"),
      (es: Seq[Expression]) => TokenHash32(es.head)))
    e.injectFunction((
      new FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (es: Seq[Expression]) => MinHashSigs(es.head)))
    e.injectFunction((
      new FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (es: Seq[Expression]) => SimHash32(es.head)))
    e.injectFunction((
      new FunctionIdentifier("content_fingerprint"),
      new ExpressionInfo(classOf[ContentFingerprint].getName, "content_fingerprint"),
      (es: Seq[Expression]) => ContentFingerprint(es.head)))
    // aggregate: the analyzer wraps a bare AggregateFunction returned
    // from a function builder into an AggregateExpression
    e.injectFunction((
      new FunctionIdentifier("vector_mean"),
      new ExpressionInfo(classOf[VectorMean].getName, "vector_mean"),
      (es: Seq[Expression]) => VectorMean(es.head)))
  }
}
