package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Attribute-recognition stage (SURVEY X2/A1/F7/F8).
  *
  * The reference recognizer is a black-box UDF tracklet→attributes
  * (`alg/pedestrian/attr/Recognizer.java:31-40`) whose per-sample
  * outputs are mean-combined per tracklet
  * (`DeepMARCaffe2Native.java:197-207`, field-wise float mean via
  * `Attributes.add`/`div`, `Attributes.java:446-475`).
  *
  * Engine design:
  *  - the recognizer itself stays a pluggable black box; the
  *    deterministic stand-in below is pure column arithmetic (codegen'd,
  *    no UDF), mirroring the role of the reference's FakeRecognizer;
  *  - the mean over per-sample vectors is a *distributed* aggregation:
  *    posexplode → partial sums per (key, pos) → re-assemble, i.e.
  *    map-side combine everywhere, never a collect_list of whole
  *    vectors on the hot path.
  */
object AttributeOps {

  /** Deterministic per-detection attribute score for demo/test
    * pipelines: engine-portable integer arithmetic scaled to [0,1).
    * dim selects one of the attribute positions. */
  def fakeScore(id: Column, dim: Int): Column =
    ((id * lit(31 + dim * 2) + lit(7 + dim)) % 997) / lit(997.0)

  /** Deterministic attribute vector of `dims` scores (array<double>).
    * Native loop kernel ([[org.apache.spark.sql.graft.FakeAttrVector]]):
    * the composed `array(fakeScore(id,0), ...)` form generates one
    * straight-line codegen method per plan that exceeds HotSpot's JIT
    * bytecode ceiling at 128 dims and runs interpreted (~23 µs/row
    * measured); the loop kernel is JIT-friendly at any width. */
  def fakeAttributeVector(id: Column, dims: Int): Column =
    org.apache.spark.sql.graft.VectorExpressions.fake_attrs(id, dims)

  /** Composed-builtins twin of [[fakeAttributeVector]] — the executable
    * spec of the kernel's semantics (OperatorsSpec proves parity). */
  def fakeAttributeVectorComposed(id: Column, dims: Int): Column =
    array((0 until dims).map(d => fakeScore(id, d)): _*)

  /** Field-wise mean of vector columns per key — the A1 aggregation.
    * Input: df with keyCols and an array<numeric> column `vecCol`
    * (all rows same length). Output: keyCols + `mean_vec` array<double>
    * + `n_samples`.
    *
    * Implementation: [[org.apache.spark.sql.graft.VectorMean]], a
    * TypedImperativeAggregate whose buffer is a fixed double[dims] —
    * partials combine MAP-SIDE, so one shuffle moves one (key, vector)
    * row per key per mapper. (The earlier posexplode formulation —
    * [[meanVectorsExploded]] — shuffled dims× the row count and needed
    * a second aggregation plus sort to reassemble.) */
  def meanVectors(df: DataFrame, keyCols: Seq[String], vecCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        org.apache.spark.sql.graft.VectorMeanAgg.vector_mean(col(vecCol))
          .as("mean_vec"),
        // rows with a non-empty vector, like the twin's max-per-position
        // count (null and empty arrays contribute no positions)
        count(when(size(col(vecCol)) > 0, 1)).as("n_samples"))

  /** The declarative twin of [[meanVectors]]: posexplode →
    * per-(key,pos) partial sums → reassemble. Kept as the executable
    * spec of the aggregate's semantics (OperatorsSpec proves
    * equivalence) and as the fallback shape for engines without
    * imperative aggregates. */
  def meanVectorsExploded(df: DataFrame, keyCols: Seq[String], vecCol: String): DataFrame = {
    val keyed = df.select(
      keyCols.map(col) :+ posexplode(col(vecCol)).as(Seq("pos", "v")): _*)
    keyed
      .groupBy((keyCols :+ "pos").map(col): _*)
      .agg(sum("v").as("s"), count(lit(1)).as("c"))
      .groupBy(keyCols.map(col): _*)
      .agg(
        transform(
          array_sort(
            collect_list(struct(col("pos"), (col("s") / col("c")).as("m"))),
            (a, b) => when(a("pos") < b("pos"), -1)
              .when(a("pos") > b("pos"), 1).otherwise(0)),
          e => e("m")).as("mean_vec"),
        max(col("c")).as("n_samples"))
  }
}
