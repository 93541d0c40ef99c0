package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: AS-OF join and range
  * (interval) join — both named gaps in the engine's operator surface
  * and both staples of event-sequence analytics (the reference's
  * late-data retry joins are a streaming cousin of AS-OF: "match each
  * record to the newest earlier state", `PedestrianReIDUsingAttrApp
  * .java:156-198`).
  *
  * Neither is implemented as an inequality theta-join: Spark plans a
  * bare `t1.ts >= t2.ts` join as BroadcastNestedLoop (quadratic work,
  * single-threaded build at worst). The formulations here stay in
  * equi-join/window land so Catalyst keeps hash partitioning and
  * whole-stage codegen:
  *
  *  - AS-OF = union + per-key running `last(ignoreNulls)`: ONE shuffle
  *    on the join key (both sides co-partitioned by the union), no
  *    pair explosion — each output row is produced by a sort + running
  *    carry within its key partition. This is the MERGE_ASOF shape at
  *    cluster scale: cost O((|probe|+|build|) log per-key-run).
  *  - range join = bin-bucketed equi-join: intervals explode to the
  *    fixed-width bins they overlap, points hash to their single bin,
  *    and the bin key turns the interval predicate into an equi-join
  *    key with a residual range filter. Work is proportional to true
  *    overlap (plus one bin of slack per interval edge), never to
  *    |intervals| × |points|.
  */
object TemporalJoins {

  /** AS-OF join: for each `probe` row, attach the `build` row with the
    * greatest `tsCol` ≤ the probe's `tsCol` within the same `keyCol`
    * (inclusive match, i.e. MERGE_ASOF backward semantics / DuckDB
    * `ASOF JOIN ... ON probe.ts >= build.ts`). Left-outer: probes with
    * no earlier build row keep typed nulls.
    *
    * Build columns come back prefixed `asof_` (including the matched
    * build timestamp as `asof_<tsCol>`).
    *
    * Determinism contract: `build` must be unique per (key, ts) —
    * pre-aggregate ties (e.g. `max_by`) before calling, exactly as a
    * SQL ASOF join requires for a well-defined answer.
    *
    * Plan shape: both sides are projected to one unified schema and
    * unioned (no join node at all), then a single window
    * `partitionBy(key).orderBy(ts, side)` computes a running
    * `last(build payload, ignoreNulls)`. Build rows sort BEFORE probe
    * rows at equal ts (side 0 < 1), which is what makes the match
    * inclusive. One exchange on `keyCol`; skew is bounded by per-key
    * row count, not by match multiplicity.
    *
    * The build payload is carried as ONE atomic struct, not per-field:
    * a per-field `last(ignoreNulls)` would let a NULL payload field
    * "see through" to an OLDER build row while its siblings come from
    * the newest — mixing fields across build rows, which no ASOF join
    * may do. The struct wrapper is never null for a build row (even
    * when every field inside is), so the running carry always moves
    * whole rows. */
  def asOfJoin(probe: DataFrame, build: DataFrame,
               keyCol: String, tsCol: String): DataFrame = {
    val payloadFields = build.schema.fields
      .filter(f => f.name != keyCol).toIndexedSeq // build ts is payload too
    val probeCols = probe.columns.toIndexedSeq
    require(!probeCols.exists(_.startsWith("asof_")),
      "probe columns may not start with the reserved prefix asof_")
    val payloadType = org.apache.spark.sql.types.StructType(payloadFields)

    val buildSide = build.select(
      Seq(col(keyCol), col(tsCol).as("__ts"), lit(0).as("__side"),
        struct(payloadFields.map(f => col(f.name)): _*).as("__b")) ++
        probeCols.filter(_ != keyCol)
          .map(c => lit(null).cast(probe.schema(c).dataType).as(c)): _*)
    val probeSide = probe.select(
      Seq(col(keyCol), col(tsCol).as("__ts"), lit(1).as("__side"),
        lit(null).cast(payloadType).as("__b")) ++
        probeCols.filter(_ != keyCol).map(col): _*)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = buildSide.unionByName(probeSide)
      .select(
        Seq(col(keyCol), col("__side")) ++
          probeCols.filter(_ != keyCol).map(col) :+
          last(col("__b"), ignoreNulls = true).over(w).as("__c"): _*)
    carried.filter(col("__side") === 1)
      .select(
        Seq(col(keyCol)) ++
          probeCols.filter(_ != keyCol).map(col) ++
          payloadFields.map(f =>
            col("__c").getField(f.name).as(s"asof_${f.name}")): _*)
  }

  /** Range (interval) join: every (interval, point) pair with
    * `loCol <= point < hiCol` — half-open, exact long arithmetic (the
    * caller converts timestamps to epoch micros; integer comparisons
    * can't disagree across engines).
    *
    * Bin-bucketed: each interval explodes to `sequence(lo div w,
    * hi div w)` bin keys (±1 bin of edge slack), each point computes
    * its single bin, and the join runs as an EQUI-join on the bin key
    * with the residual `lo <= pt < hi` filter — hash-partitioned,
    * codegen'd, AQE-splittable, never a nested-loop. `binWidth` trades
    * interval fan-out (long intervals explode to more bins) against
    * residual-filter selectivity (wide bins pull in more non-matching
    * points); size it near the median interval length.
    *
    * If the interval side is small (a dimension of windows), wrap it
    * in `broadcast(...)` before calling — the exploded bin table stays
    * small and the join needs no shuffle at all. */
  def rangeJoinBinned(intervals: DataFrame, loCol: String, hiCol: String,
                      points: DataFrame, ptCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    // exact floor division: c - pmod(c, w) is a true multiple of w, so
    // the double division is error-free for quotients up to 2^53
    // (pmod, unlike %, already floors for negative c)
    def floorDiv(c: Column): Column =
      ((c - pmod(c, lit(binWidth))) / lit(binWidth)).cast("long")
    val iv = intervals.withColumn("__bin",
      explode(sequence(floorDiv(col(loCol)), floorDiv(col(hiCol)))))
    val pt = points.withColumn("__bin", floorDiv(col(ptCol)))
    iv.join(pt, Seq("__bin"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bin")
  }
}
