package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Even-interval sequence sampling (SURVEY A2).
  *
  * Reproduces the reference's `Tracklet.sample(numSamples)` semantics
  * exactly (`alg/pedestrian/tracking/Tracklet.java:148-172`):
  *  - numSamples == -1 → keep all
  *  - numSamples == 0  → keep none
  *  - n <= numSamples  → keep all
  *  - else interval = n / (numSamples + 1),
  *         start = (n - (numSamples - 1) * interval) / 2,
  *         keep indices i with (i - start) % interval == 0.
  *
  * Note the faithful quirk: indices below `start` that are congruent to
  * `start` mod `interval` are also kept (Java `%` sign semantics), so
  * slightly more than `numSamples` patches can survive — our column
  * implementation and the Scala reference implementation agree on this
  * by construction, and the spec asserts it.
  */
object Sampling {

  /** Scala-side reference implementation (for tests / driver code). */
  def evenSampleIndices(n: Int, numSamples: Int): Seq[Int] = {
    require(n >= 0)
    if (numSamples == -1) 0 until n
    else if (numSamples == 0) Seq.empty
    else if (n <= numSamples) 0 until n
    else {
      val interval = n / (numSamples + 1)
      val start = (n - (numSamples - 1) * interval) / 2
      (0 until n).filter(i => (i - start) % interval == 0)
    }
  }

  /** Kept-index array as a column. `n` must be a positive int column.
    * Stays entirely inside codegen'd higher-order functions — no UDF. */
  def evenSampleIndicesCol(n: Column, numSamples: Int): Column = {
    // sequence(0, n-1) with n=0 would produce the DESCENDING [0,-1]
    // (Spark default step is -1 when start > stop) — guard empties.
    val empty = array().cast("array<int>")
    val all = when(n <= 0, empty).otherwise(sequence(lit(0), greatest(n, lit(1)) - 1))
    if (numSamples == -1) all
    else if (numSamples == 0) empty
    else {
      val interval = floor(n / (numSamples + 1)).cast("int")
      val start = floor((n - lit(numSamples - 1) * interval) / 2).cast("int")
      when(n <= numSamples, all)
        .otherwise(filter(all, i => (i - start) % interval === 0))
    }
  }

  /** Apply sampling to an array-of-struct sequence column: null the
    * `patch` field of non-sample elements (reference keeps the bbox,
    * clears the pixels). `seqCol` must be array<struct<..., patch>>. */
  def samplePatches(seqCol: Column, numSamples: Int): Column = {
    val n = size(seqCol)
    val kept = evenSampleIndicesCol(n, numSamples)
    // Same n=0 pitfall as evenSampleIndicesCol: sequence(0, n-1) with
    // n=0 yields the DESCENDING [0,-1] and zip_with would pad the
    // shorter side with nulls — guard empties explicitly.
    val idx = when(n <= 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), greatest(n, lit(1)) - 1))
    zip_with(
      seqCol,
      idx,
      (box, i) => when(array_contains(kept, i), box)
        .otherwise(box.withField("patch", lit(null).cast("binary"))))
  }
}
