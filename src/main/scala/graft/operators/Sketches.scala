package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Deterministic cardinality sketching (HyperLogLog, Flajolet et al.
  * 2007) built from the engine-portable md5 hash family — every
  * arithmetic step is integer-exact, so the sketch registers (and the
  * single float division that produces the estimate) are bit-identical
  * between Spark and the DuckDB oracle. Spark's own
  * `approx_count_distinct` is an HLL++ too, but its xxhash64 seeds and
  * bias tables have no cross-engine twin — this one is the
  * hash-checkable form of the same idea.
  *
  * Why it matters at 100 TB: `COUNT(DISTINCT token)` over a corpus
  * shuffles every distinct value; the sketch reduces the whole corpus
  * to `m` integer registers with a map-side-combinable `max` — the
  * only thing that ever crosses the network is m (key, max) pairs per
  * partition. Registers from disjoint shards merge by element-wise
  * max, so per-day sketches roll up to per-year cardinalities without
  * rescanning (the standard telemetry/corpus-profiling trick).
  */
object Sketches {

  /** Register-index bits: m = 2^P registers. 256 registers ≈ 6.5%
    * standard error — profiling resolution, at 2 KB of state. */
  val P = 8
  val M: Int = 1 << P // 256

  /** Hash width actually used (HashFunctions.hash32); the suffix
    * w = h >> P has HashBits - P = 24 bits, so rho ranges 1..25. */
  val HashBits = 32

  /** Scaling exponent for the harmonic sum: Σ 2^(-M_j) is rescaled to
    * Σ 2^(HarmonicScale - M_j), an exact Long (max rho = 25 keeps every
    * term ≥ 2^5; empty registers contribute 2^HarmonicScale). */
  val HarmonicScale = 30

  /** α_m · m² for m = 256 (Flajolet's bias correction,
    * α_m = 0.7213 / (1 + 1.079/m)): both engines evaluate this exact
    * literal expression the same way, so the estimate divides two
    * bit-identical numbers. */
  def alphaM2: Double = 0.7213 / (1.0 + 1.079 / M) * M * M

  // --- Count-Min sketch (Cormode & Muthukrishnan 2005) ---------------

  /** Count-Min depth (independent hash rows) and width (counters per
    * row): d×w = 4×1024 bounds the overestimate of a count by
    * ~e·N/w with probability 1−e^−d — heavy-hitter resolution in 16 KB
    * of state. */
  val CmDepth = 4
  val CmWidth = 1024

  /** Row-r counter position of a value: the salted portable hash mod
    * w. Salting with a per-row prefix gives d independent hash
    * functions from the single md5 family (same twin in SQL). */
  def cmPosition(value: Column, r: Int): Column =
    pmod(HashFunctions.hash32(concat(lit(s"cm$r:"), value)), lit(CmWidth))

  /** The d×w counter matrix of a value column: ≤ d·w rows of
    * (r, pos, c). One corpus-sized pass; the groupBy partial-aggregates
    * map-side so at most d·w rows per partition shuffle, and counter
    * matrices from disjoint shards merge by element-wise SUM (the
    * additivity that makes the sketch roll up across days/shards). */
  def cmCounters(values: DataFrame, valueCol: String): DataFrame =
    values
      .select(posexplode(array((0 until CmDepth)
        .map(r => cmPosition(col(valueCol), r)): _*)).as(Seq("r", "pos")))
      .groupBy(col("r"), col("pos"))
      .agg(count(lit(1)).as("c"))

  /** [[cmCounters]] from an ALREADY-AGGREGATED (value, weight) frame:
    * cell counts are the weight SUM of the values hashing into the
    * cell — integer-identical to hashing each occurrence (the sketch
    * is additive), but the d-way position explode runs over DISTINCT
    * values instead of the corpus. The consumer that already
    * wordcounts (heavy hitters needs the exact top anyway) builds the
    * matrix from the vocabulary-sized result for free — one corpus
    * pass instead of two (equivalence spec-pinned in
    * TemporalJoinsSpec). */
  def cmCountersWeighted(counts: DataFrame, valueCol: String,
                         weightCol: String): DataFrame =
    counts
      .select(col(weightCol).as("_w"), posexplode(array((0 until CmDepth)
        .map(r => cmPosition(col(valueCol), r)): _*)).as(Seq("r", "pos")))
      .groupBy(col("r"), col("pos"))
      .agg(sum(col("_w")).as("c"))

  /** Point-estimate the counts of `probes` (a small frame with
    * `valueCol`) against a counter matrix: est(v) = min over rows r of
    * counter[r, pos_r(v)] — never an underestimate, overestimate
    * bounded by the row-collision mass. The counter matrix is ≤ d·w
    * rows, so it broadcasts; the probe side never shuffles.
    *
    * The counter matrix stores only OCCUPIED cells, so the join must be
    * a LEFT join with absent cells read as 0 — a true Count-Min cell
    * that nothing hashed into holds zero, and a probe value absent from
    * the sketched corpus must estimate as the min INCLUDING its zero
    * cells (an inner join would inflate it to the min of only the
    * colliding cells, or drop the probe row entirely). */
  def cmEstimate(counters: DataFrame, probes: DataFrame,
                 valueCol: String): DataFrame = {
    val probePos = probes.select(col("*"),
      posexplode(array((0 until CmDepth)
        .map(r => cmPosition(col(valueCol), r)): _*)).as(Seq("r", "pos")))
    probePos.join(broadcast(counters), Seq("r", "pos"), "left")
      .groupBy(probes.columns.map(col).toIndexedSeq: _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("cm_estimate"))
  }

  // --- histogram quantiles -------------------------------------------

  /** Fixed-bin integer histogram quantiles: the deterministic,
    * mergeable quantile sketch (the role t-digest/KLL play in real
    * pipelines, in the form whose every step has a bit-exact SQL
    * twin — their compaction orders don't). Values are binned by
    * truncating division; a quantile is answered as the lower bound
    * of the first bin whose cumulative count reaches ceil(q·N) —
    * resolution = binWidth, state = #occupied bins, shards merge by
    * per-bin SUM. At 100 TB this is one scan + a histogram-sized
    * shuffle; the exact alternative (sort or `percentile`) moves the
    * whole column. */
  def histogramBins(values: DataFrame, valueCol: String,
                    binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    values
      .select(((col(valueCol) - pmod(col(valueCol), lit(binWidth))) / binWidth)
        .cast("long").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("c"))
  }

  /** Answer quantiles from a bin histogram: for each q (in basis
    * points), the smallest bin lower-bound whose running count reaches
    * ceil(q·N / 10000). The window runs over the histogram (bins, not
    * rows); ties and exact-boundary behavior are fully determined by
    * integer arithmetic. */
  def histogramQuantiles(bins: DataFrame, binWidth: Long,
                         qsBp: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bins
      .withColumn("cum", sum(col("c")).over(w))
      .crossJoin(broadcast(bins.agg(sum(col("c")).as("n_total"))))
    // round-13 opt: ONE aggregation answers every requested quantile —
    // the first qualifying bin is min(bin | cum·10⁴ ≥ N·q) — instead
    // of one filter+sort+limit(1) plan (and job) per quantile; stack()
    // unrolls the single result row back into the (q_bp, q_value,
    // n_total) rows the report shape wants, in qsBp order (duplicate
    // q values aggregate once and stack twice — same rows as the old
    // per-q union form; review finding: duplicate column names were an
    // ambiguous-reference error).
    val qsDistinct = qsBp.distinct
    val agg = cum.agg(
      qsDistinct.map(q => min(when(col("cum") * 10000 >= col("n_total") * q,
          col("bin"))).as(s"_b$q")).head,
      qsDistinct.tail.map(q => min(when(col("cum") * 10000 >= col("n_total") * q,
          col("bin"))).as(s"_b$q")) :+ max(col("n_total")).as("_nt"): _*)
    agg.select(expr("stack(" + qsBp.length + ", " +
      qsBp.map(q => s"${q}L, _b$q * $binWidth, _nt").mkString(", ") +
      ") as (q_bp, q_value, n_total)"))
  }

  /** Per-value (bucket, rho) pair: bucket = low P bits of the 32-bit
    * hash, rho = 1 + leading zeros of the remaining 24-bit suffix.
    * The leading-zero count is `24 - bitlength(w) + 1` via `bin()`
    * (identical no-leading-zeros semantics in Spark and DuckDB) —
    * integer-only, no log2 float boundary risk. */
  def bucketAndRho(value: Column): (Column, Column) = {
    val h = HashFunctions.hash32(value)
    val w = (h / lit(M)).cast("long") // h >= 0: truncation = floor
    val rho = when(w === 0, lit(HashBits - P + 1))
      .otherwise(lit(HashBits - P + 1) - length(bin(w)))
    (pmod(h, lit(M)).as("bucket"), rho.cast("int").as("rho"))
  }

  /** HLL registers of a value column: ≤ m rows of (bucket, max rho).
    * The groupBy partial-aggregates map-side, so the shuffle moves at
    * most m rows per upstream partition. Buckets no value hashed into
    * are absent (the estimator counts them as register 0). */
  def hllRegisters(values: DataFrame, valueCol: String): DataFrame = {
    val (bucket, rho) = bucketAndRho(col(valueCol))
    values.select(bucket, rho)
      .groupBy(col("bucket"))
      .agg(max(col("rho")).as("m_j"))
  }

  /** Collapse registers to a one-row summary: the exact-integer sketch
    * state (register count, Σρ, the 2^30-scaled harmonic sum including
    * empty registers) plus the raw HLL estimate
    * E = α_m · m² · 2^30 / harmonic_scaled, with the small-range
    * linear-counting correction (E ≤ 2.5m and empty registers present
    * → m · ln(m / zeros)). Every float input is an exact integer from
    * the same row, so the rounded estimate reproduces across engines. */
  def hllSummary(registers: DataFrame): DataFrame = {
    val m = lit(M.toLong)
    val zeros = m - col("registers_present")
    val harmonic = col("harmonic_present") + zeros * lit(1L << HarmonicScale)
    val rawE = lit(alphaM2) * lit((1L << HarmonicScale).toDouble) / harmonic
    val estimate = when(rawE <= lit(2.5 * M) && zeros > 0,
      lit(M.toDouble) * log(m.cast("double") / zeros.cast("double")))
      .otherwise(rawE)
    registers
      .agg(
        count(lit(1)).cast("long").as("registers_present"),
        sum(col("m_j").cast("long")).as("sum_rho"),
        sum(expr(s"shiftleft(1L, $HarmonicScale - m_j)")).as("harmonic_present"))
      .select(m.as("m"), col("registers_present"), zeros.as("zero_registers"),
        col("sum_rho"), harmonic.as("harmonic_scaled"),
        round(estimate, 2).as("hll_estimate"))
  }
}
