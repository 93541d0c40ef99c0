package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot join/group keys (the 100 TB
  * concern ARCHITECTURE.md documents: hot LSH buckets, celebrity
  * tasks). AQE's skew-join handles order-of-magnitude skew
  * automatically; explicit salting is for the pathological keys AQE
  * can't split (e.g. a single group key doing a groupBy, or a
  * broadcast-ineligible hot build side).
  *
  * Pattern: fact side gets a deterministic salt in [0, n); the
  * dimension/right side is exploded n× with every salt value; the join
  * key becomes (key, salt). Aggregations two-phase: partial agg on
  * (key, salt), final agg on key.
  */
object Skew {

  /** Deterministic salt derived from stable row columns (no rand() —
    * keeps retries/replays consistent). Pass columns that vary WITHIN
    * the hot key (a row id, a timestamp) — salting by the key itself
    * would put the whole hot key in one bucket. */
  def salt(n: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(n))

  /** Explode the small side n× so every (key, salt) bucket finds its
    * match. */
  def explodeSalts(df: DataFrame, n: Int): DataFrame =
    df.withColumn("salt", explode(sequence(lit(0), lit(n - 1))))

  /** Two-phase count over a salted key: partial counts on (key, salt),
    * final combine on key. Any row→salt assignment is correct for
    * algebraic aggregates; monotonically_increasing_id is deterministic
    * for a fixed partition layout (task retries replay whole
    * partitions, so consistency holds). */
  def saltedCount(df: DataFrame, keyCol: String, saltBuckets: Int): DataFrame =
    df.withColumn("salt", pmod(monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(col(keyCol), col("salt"))
      .agg(count(lit(1)).as("partial_n"))
      .groupBy(col(keyCol))
      .agg(sum("partial_n").as("n"))

  /** Salted EQUI-JOIN for a hot probe key against a
    * broadcast-ineligible build side: probe rows are salted from
    * columns that vary WITHIN the hot key, the build side is exploded
    * `saltBuckets`× so every (key, salt) bucket finds its match, and
    * the join runs on the composite key — the hot key's rows spread
    * over `saltBuckets` reducers instead of one. Build-side cost is
    * the explosion factor (same trade as a broadcast, paid through the
    * shuffle), so size `saltBuckets` to the skew, not the cluster.
    * Each probe row lives in exactly ONE salt bucket and its build row
    * is present in all of them, so match multiplicity is unchanged —
    * the parity property OperatorsSpec pins against the plain join. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 saltBuckets: Int, saltFrom: Seq[String],
                 joinType: String = "inner"): DataFrame = {
    require(saltFrom.nonEmpty, "salt needs within-key-varying columns")
    // The multiplicity argument above holds only for probe-preserving
    // join types: a build row's saltBuckets-1 unmatched copies would
    // emit EXTRA null-probe rows under right/full outer. Reject those
    // rather than silently multiply (a right-outer caller swaps the
    // sides; full outer needs a copy-dedup this operator doesn't do).
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti",
        "semi", "anti").contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin preserves multiplicity only for probe-preserving " +
        s"join types (inner/left_outer/left_semi/left_anti): $joinType")
    val p = probe.withColumn("__salt", salt(saltBuckets, saltFrom.map(col): _*))
    val b = explodeSalts(build, saltBuckets).withColumnRenamed("salt", "__salt")
    p.join(b, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
