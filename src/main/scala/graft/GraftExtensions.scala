package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft._

/** SparkSessionExtensions entry point: makes the engine's custom
  * Catalyst expressions available by SQL name in any session built
  * with `.withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.GraftExtensions`. (NOTE:
  * `SparkSession.builder.getOrCreate` REUSES an existing session and
  * silently drops extensions — ExtensionsSpec documents the pitfall.)
  *
  * This is the library's injection surface — new optimizer rules or
  * planner strategies (should a future operator need them; SURVEY §4
  * concluded none are required yet) register here too.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def reg(e: SparkSessionExtensions, name: String, clazz: Class[_])(
      builder: Seq[Expression] => Expression): Unit =
    e.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      builder))

  override def apply(e: SparkSessionExtensions): Unit = {
    // SURVEY §4 routing pushdown: a consumer's array_contains(dest_ports,
    // p) filter over a RoutedStore layout becomes `port` partition
    // selection (topic subscription at the file level). Pre-existing
    // sessions use RoutingPushdown.install instead.
    e.injectOptimizerRule(_ => graft.plans.RoutingPushdown)
    reg(e, "dot_long", classOf[DotProductLong])(es => DotProductLong(es.head, es(1)))
    reg(e, "cosine_sim", classOf[CosineSimilarityD])(es => CosineSimilarityD(es.head, es(1)))
    reg(e, "l2sq_long", classOf[L2SqLong])(es => L2SqLong(es.head, es(1)))
    // k must be a foldable integer expression (shingle width)
    reg(e, "shingle_hash32", classOf[ShingleHash32])(es => {
      if (es.length != 2 || !es(1).foldable ||
          !es(1).eval().isInstanceOf[Number])
        throw new IllegalArgumentException(
          "shingle_hash32(text, k): k must be a foldable integer literal " +
            "(the shingle width), got " + es.drop(1).mkString(", "))
      ShingleHash32(es.head, es(1).eval().asInstanceOf[Number].intValue())
    })
    reg(e, "token_hash32", classOf[TokenHash32])(es => TokenHash32(es.head))
    reg(e, "token_hash64", classOf[TokenHash64])(es => TokenHash64(es.head))
    reg(e, "minhash_sigs", classOf[MinHashSigs])(es => MinHashSigs(es.head))
    reg(e, "simhash32", classOf[SimHash32])(es => SimHash32(es.head))
    reg(e, "simhash64", classOf[SimHash64])(es => SimHash64(es.head))
    reg(e, "content_fingerprint", classOf[ContentFingerprint])(es =>
      ContentFingerprint(es.head))
    // aggregate: the analyzer wraps a bare AggregateFunction returned
    // from a function builder into an AggregateExpression
    reg(e, "vector_mean", classOf[VectorMean])(es => VectorMean(es.head))
  }
}
