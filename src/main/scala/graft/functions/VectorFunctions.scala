package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.VectorExpressions

/** Public facade over the custom codegen'd vector expressions (which
  * live in the org.apache.spark.sql.graft bridge package because
  * Spark 4 marks the expression-construction API private[sql]). */
object VectorFunctions {
  /** Exact integer dot product (codegen'd). Inputs: array<long>. */
  def dot_long(a: Column, b: Column): Column = VectorExpressions.dot_long(a, b)

  /** Cosine similarity (codegen'd). Inputs cast to array<double>. */
  def cosine_sim(a: Column, b: Column): Column = VectorExpressions.cosine_sim(a, b)

  /** Register SQL function names on a session. */
  def register(spark: SparkSession): Unit = VectorExpressions.register(spark)
}
