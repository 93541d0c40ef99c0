package graft.operators

import org.apache.spark.sql.SparkSession

/** THE sizing module — every data-sized capacity decision in the
  * engine derives from these two rules, so the next working-set
  * operator gets the policy by construction instead of by a fourth
  * rediscovery of the same cliff (rounds 7-8 hit the identical defect
  * class three times: §4.9 fat-join hash build, §4.12 pair-sort width,
  * §4.3 bucket-space width — each a per-task working set sized by the
  * session's core count or a constant instead of by data bytes).
  *
  * Rule 1 — [[exchangeWidth]]: a shuffle whose per-task working set
  * CANNOT spill (a SHUFFLE_HASH build relation, an in-memory partial
  * top-k sort run) must be wide enough that
  * `working_set_bytes / width ≤ budget`: with W concurrent tasks the
  * peak memory is `W × total_bytes × expansion / width`, so width must
  * scale with the DATA, never stay pinned at
  * spark.sql.shuffle.partitions. Below the session default the policy
  * returns None — small-SF plans (and their pinned shapes) untouched.
  *
  * Rule 2 — [[bucketBits]]: a hash-bucket key space (LSH buckets) must
  * grow with the corpus so EXPECTED per-bucket population stays
  * constant — a fixed bucket width means per-bucket pair cost grows
  * linearly with the corpus. (OBSERVED-population skew control on top
  * of this is [[Similarity.refineHotKeys]]'s job; expectation sizing
  * and observation refinement compose.)
  */
object Sizing {

  /** Per-task working-set budget. 64 MB keeps W concurrent tasks well
    * inside any sane executor's execution-memory share (local[32]:
    * 32 × 64 MB × safety ≈ 2 GB against a ≥14 GB pool; a 4-core/16 GB
    * cluster executor: 4 × 64 MB) while keeping task-launch overhead
    * negligible at the widths it produces. */
  val PerTaskBudgetBytes: Long = 64L << 20

  /** Exchange width for a non-spillable per-task working set:
    * `ceil(units × bytesPerUnit / budget)` partitions, or None when
    * the session default already satisfies the budget (the common
    * small-SF case — returning None leaves the plan untouched).
    *
    * `units` is the free, exact size signal the caller already has
    * (staged parquet bytes, a row count); `bytesPerUnit` converts it
    * to PEAK working-set bytes (parquet→build-relation expansion ×
    * band fan-out, sort-row bytes × population cap, …) — derived per
    * call site and pinned with its rationale in FatJoinWidthSpec.
    * Round UP on every estimate: an over-wide exchange costs a few
    * task launches, an under-wide one is the §4.9 OOM. */
  def exchangeWidth(spark: SparkSession, units: Long,
                    bytesPerUnit: Double,
                    budgetBytes: Long = PerTaskBudgetBytes): Option[Int] = {
    require(units >= 0 && bytesPerUnit > 0 && budgetBytes > 0,
      s"invalid exchange sizing: units=$units bytesPerUnit=$bytesPerUnit " +
        s"budget=$budgetBytes")
    val defaultParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val need = math.ceil(units.toDouble * bytesPerUnit / budgetBytes).toInt
    if (need > defaultParts) Some(need) else None
  }

  /** Bucket-space width for hash-bucketed pair joins: the smallest
    * nBits whose 2^nBits buckets hold an EXPECTED population of at
    * most `targetBucketPop` under uniform spread, floored at minBits.
    * Integer arithmetic, not ceil(log2(…)): floating log mis-rounds at
    * exact powers of two and the SQL twins must agree bit-for-bit. */
  def bucketBits(corpusSize: Long, targetBucketPop: Int = 64,
                 minBits: Int = 8, maxBits: Int = 30): Int = {
    require(corpusSize >= 0 && targetBucketPop > 0 && minBits >= 1 &&
      maxBits >= minBits, "invalid LSH sizing parameters")
    var b = 0
    while (b < maxBits && (targetBucketPop.toLong << b) < corpusSize) b += 1
    math.max(minBits, b)
  }
}
