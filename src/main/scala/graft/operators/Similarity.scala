package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector-similarity kernels + neighbor queries (SURVEY X4/T1/G9).
  *
  * Reference surface: `PedestrianComparerUsingAttr` (pair → float
  * similarity, `alg/pedestrian/reid/PedestrianComparerUsingAttr.java:30-41`)
  * and the top-k-by-similarity graph query
  * (`vpe/data/Neo4jConnector.java:752-779`, ORDER BY similarity DESC).
  *
  * Kernels are pure higher-order-function expressions — inside
  * whole-stage codegen, no UDF. `dotQuantized` works on integer-
  * quantized vectors so results are EXACT (bit-identical across
  * engines); `cosine` is IEEE-double with left-to-right accumulation.
  */
object Similarity {

  /** Quantize a float vector to integer milli-units: exact cross-engine
    * arithmetic (values up to ~2^40 stay exact in any engine). */
  def quantize(vec: Column, scale: Int = 1000): Column =
    transform(vec, x => round(x.cast("double") * scale).cast("long"))

  /** Integer dot product over quantized vectors — exact, codegen'd
    * ([[graft.functions.VectorFunctions.dot_long]]). */
  def dotLong(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot_long(a, b)

  /** Double dot product (higher-order-function form; fine off the hot
    * path, use the custom expressions on pair joins). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity in double precision — single-pass codegen'd
    * expression ([[graft.functions.VectorFunctions.cosine_sim]]). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosine_sim(a, b)

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)

  /** Per-key top-k rows by (score desc, tieCol asc) — the G9/T1 shape.
    * Window + row_number: one shuffle on partitionCol, then
    * partition-local. */
  def topKPerKey(df: DataFrame, partitionCol: String, scoreCol: String,
                 tieCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(partitionCol))
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Brute-force k-NN of `probes` against `candidates` on quantized dot
    * product. Probes are broadcast (the small side); candidates never
    * shuffle — at 100 TB this is a single scan of the candidate table.
    * Both inputs need (idCol, vecCol). */
  def bruteForceTopK(probes: DataFrame, candidates: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), quantize(col(vecCol)).as("pv"))
    val c = candidates.select(col(idCol).as("candidate_id"), quantize(col(vecCol)).as("cv"))
    val scored = c.join(broadcast(p), col("probe_id") =!= col("candidate_id"))
      .select(col("probe_id"), col("candidate_id"),
        dotLong(col("pv"), col("cv")).as("score"))
    topKPerKey(scored, "probe_id", "score", "candidate_id", k)
      .select(col("probe_id"), col("rank"), col("candidate_id"), col("score"))
  }

  /** Exact squared L2 over quantized (long) vectors — integer-exact
    * like dotLong; codegen'd single pass
    * ([[org.apache.spark.sql.graft.L2SqLong]]). */
  def l2sqLong(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.HashExpressions.l2sq_long(a, b)

  /** IVF coarse assignment (the second ANN scale path, alongside LSH):
    * each vector goes to its nearest centroid cell by exact quantized
    * L2. `centroids` must be small (broadcast). A production pipeline
    * would train centroids with k-means; any deterministic centroid
    * set works for the index structure itself — the partitioning and
    * search shape are identical.
    *
    * Returns vecs + `cell` (centroid id). Scale: one broadcast join +
    * per-row argmin, no shuffle of the vector table. */
  /** Inline-literal argmin cell assignment over an already-quantized
    * frame (must carry a `qv` array<long> column). Assignment is a pure
    * per-row projection — no join, no shuffle of the vector table (a
    * join+window argmin would hash-exchange the N×C expansion).
    * Tie-break: smallest cell id, via lexicographic (distance, cid)
    * struct min. */
  def assignCellsQ(vecsQ: DataFrame, cents: Seq[(Long, Array[Long])]): DataFrame = {
    require(cents.nonEmpty, "assignCellsQ: empty centroid set")
    val distStructs = array(cents.map { case (cid, qc) =>
      struct(
        l2sqLong(col("qv"), array(qc.map(lit): _*)).as("d"),
        lit(cid).as("cid"))
    }: _*)
    vecsQ.withColumn("cell", array_min(distStructs).getField("cid"))
  }

  /** Collect a small centroid table as quantized driver-side literals
    * (the broadcast-inline pattern both IVF paths share). */
  def collectCentroidsQ(centroids: DataFrame, idCol: String,
                        vecCol: String): Seq[(Long, Array[Long])] =
    centroids.select(col(idCol).cast("long"), quantize(col(vecCol)))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1).toSeq

  def ivfAssign(vecs: DataFrame, centroids: DataFrame,
                idCol: String, vecCol: String): DataFrame =
    assignCellsQ(
      vecs.select(col(idCol), col(vecCol), quantize(col(vecCol)).as("qv")),
      collectCentroidsQ(centroids, idCol, vecCol))

  /** Integer-exact Lloyd k-means over quantized vectors — the IVF
    * index TRAINING step. Each iteration: one inline-argmin assignment
    * pass over the corpus (no shuffle of the vectors) + one
    * vector_sum_long aggregation (fixed long[dims] buffer, map-side
    * combine), then the tiny (k × dims) sum table is collected and
    * centroids update as sum/n with TRUNCATING integer division —
    * chosen because Scala Long `/` and DuckDB `//` both truncate
    * toward zero, keeping training bit-identical across engines.
    * Cells that lose all members keep their previous centroid.
    * Deterministic: fixed seeds, fixed iteration count, integer math
    * throughout. */
  def kmeansQuantized(vecsQ: DataFrame, seeds: Seq[(Long, Array[Long])],
                      iters: Int): Seq[(Long, Array[Long])] = {
    var cents = seeds.sortBy(_._1)
    for (_ <- 0 until iters) {
      val sums = assignCellsQ(vecsQ, cents)
        .groupBy(col("cell"))
        .agg(org.apache.spark.sql.graft.VectorMeanAgg
          .vector_sum_long(col("qv")).as("sn"))
        .select(col("cell"), col("sn.sums"), col("sn.n"))
        .collect()
      val updated = sums.map { r =>
        val s = r.getSeq[Long](1)
        val n = r.getLong(2)
        r.getLong(0) -> s.map(_ / n).toArray
      }.toMap
      cents = cents.map { case (cid, qc) => (cid, updated.getOrElse(cid, qc)) }
    }
    cents
  }

  /** IVF probe search: for each probe, search only its `nProbe`
    * nearest cells; rank candidates by exact quantized dot product.
    * The candidate join is keyed on `cell` — block-local, never
    * all-pairs. */
  def ivfTopK(assigned: DataFrame, probes: DataFrame, centroids: DataFrame,
              idCol: String, vecCol: String, nProbe: Int, k: Int): DataFrame = {
    val c = centroids.select(col(idCol).as("_cid"), quantize(col(vecCol)).as("_qc"))
    val p = probes.select(col(idCol).as("probe_id"), quantize(col(vecCol)).as("pqv"))
    // nProbe nearest cells per probe
    val pc = p.join(broadcast(c))
      .select(col("probe_id"), col("pqv"), col("_cid"),
        l2sqLong(col("pqv"), col("_qc")).as("_d"))
    val wp = Window.partitionBy(col("probe_id")).orderBy(col("_d").asc, col("_cid").asc)
    val probeCells = pc.withColumn("_rn", row_number().over(wp))
      .filter(col("_rn") <= nProbe)
      .select(col("probe_id"), col("pqv"), col("_cid").as("cell"))
    ivfSearch(assigned, probeCells, idCol, k)
  }

  /** Quantized-input probe search: probes carry (probe_id, pqv); cells
    * come from inline-sorted (distance, cid) structs against literal
    * centroids — no join for the cell-selection step at all. */
  def ivfTopKQ(assignedQ: DataFrame, probesQ: DataFrame,
               cents: Seq[(Long, Array[Long])], idCol: String,
               nProbe: Int, k: Int): DataFrame = {
    val distArr = array(cents.map { case (cid, qc) =>
      struct(
        l2sqLong(col("pqv"), array(qc.map(lit): _*)).as("d"),
        lit(cid).as("cid"))
    }: _*)
    val probeCells = probesQ
      .withColumn("_cells", slice(array_sort(distArr), 1, nProbe))
      .select(col("probe_id"), col("pqv"),
        explode(col("_cells")).as("_c"))
      .select(col("probe_id"), col("pqv"), col("_c.cid").as("cell"))
    ivfSearch(assignedQ, probeCells, idCol, k)
  }

  /** Shared tail of both IVF paths: candidates from the probed cells
    * only (join keyed on `cell` — block-local, never all-pairs), exact
    * quantized dot ranking. */
  private[operators] def ivfSearch(assigned: DataFrame, probeCells: DataFrame,
                                   idCol: String, k: Int): DataFrame = {
    val cands = assigned.select(col("cell"), col(idCol).as("candidate_id"), col("qv"))
    val scored = probeCells.join(cands, "cell")
      .filter(col("probe_id") =!= col("candidate_id"))
      .select(col("probe_id"), col("candidate_id"),
        dotLong(col("pqv"), col("qv")).as("score"))
    topKPerKey(scored, "probe_id", "score", "candidate_id", k)
      .select(col("probe_id"), col("rank"), col("candidate_id"), col("score"))
  }

  // ---- Product quantization (PQ) --------------------------------------

  /** Inline argmin cell id against a literal centroid table (struct-min
    * on (distance, cid): tie → smaller cid — the shared tie-break of
    * assignCellsQ / pqEncode / every SQL twin's row_number). */
  private def argminCell(qv: Column, cents: Seq[(Long, Array[Long])]): Column =
    array_min(array(cents.map { case (cid, qc) =>
      struct(l2sqLong(qv, array(qc.map(lit): _*)).as("d"), lit(cid).as("cid"))
    }: _*)).getField("cid")

  /** THE primitive argmin kernel every bulk assignment path shares
    * (IVF cell assignment, PQ encode, PQ training): nearest centroid
    * of `qv[off, off+sub)` over a cid-ASCENDING-sorted centroid array,
    * strict `<` update — the exact tie-break (smallest distance, then
    * smallest cid) of the inline Catalyst struct-min forms, pinned in
    * ONE place because three hand-rolled copies had already started
    * to drift cosmetically (round-13 review finding). */
  private[operators] def argminQ(qv: Array[Long], off: Int, sub: Int,
                                 cents: Array[(Long, Array[Long])]): Long = {
    var bestD = Long.MaxValue
    var bestC = Long.MaxValue
    var i = 0
    while (i < cents.length) {
      val qc = cents(i)._2
      var d = 0L
      var j = 0
      while (j < sub) {
        val x = qv(off + j) - qc(j); d += x * x; j += 1
      }
      if (d < bestD) { bestD = d; bestC = cents(i)._1 }
      i += 1
    }
    bestC
  }

  /** Train all M PQ codebooks in ONE pass per Lloyd iteration: each
    * vector explodes to M (subspace, subvector) rows, the subspace-
    * dispatched inline argmin assigns a cell, and a single
    * groupBy(m, cell) vector_sum_long aggregation feeds every book's
    * centroid update (truncating division, same as kmeansQuantized).
    * Versus training each subspace separately this replaces 2·M
    * sequential jobs with ONE corpus scan per iteration — the fixed
    * per-job cost dominated the per-subspace form (measured 3.7 s →
    * the scan cost at sf0.1), and at 100 TB one pass over the corpus
    * instead of M is the only acceptable shape. The M× row explosion
    * carries subDim-wide slices, so bytes scanned stay ~constant and
    * the shuffle is the (M × K) partial-sum table per mapper. */
  def pqTrain(vecsQ: DataFrame,
              seedBooks: Seq[Seq[(Long, Array[Long])]],
              subDim: Int, iters: Int): Seq[Seq[(Long, Array[Long])]] = {
    var books = seedBooks.map(_.sortBy(_._1)).toIndexedSeq
    val m = books.length
    val subRows = vecsQ.select(explode(array((0 until m).map { i =>
      struct(lit(i).as("m"),
        slice(col("qv"), lit(i * subDim + 1), lit(subDim)).as("sq"))
    }: _*)).as("s"))
      .select(col("s.m").as("m"), col("s.sq").as("qv"))
    for (_ <- 0 until iters) {
      // assignment kernel dispatch, the AnnIndex.InlinePqCodewordsMax
      // discipline: the inline CaseWhen-of-argmins tree grows as
      // M × K × subDim literals — at corpus-grade K it blows Janino's
      // method budget and Spark limps on INTERPRETED (found at the
      // §4.25 rung: K=64 training spewed codegen-fallback stack
      // traces); wide books take a primitive per-partition loop,
      // bit-identical tie-break (strict <, ascending cid)
      val assigned =
        if (books.map(_.size).sum <= AnnIndex.InlinePqCodewordsMax) {
          val cellExpr = books.zipWithIndex.tail.foldLeft(
            when(col("m") === 0, argminCell(col("qv"), books(0)))) {
            case (acc, (cents, i)) =>
              acc.when(col("m") === i, argminCell(col("qv"), cents))
          }
          subRows.withColumn("cell", cellExpr)
        } else {
          val spark = vecsQ.sparkSession
          val bc = spark.sparkContext.broadcast(
            books.map(_.toArray).toArray)
          val schema = org.apache.spark.sql.types.StructType(
            subRows.schema.fields :+
              org.apache.spark.sql.types.StructField("cell",
                org.apache.spark.sql.types.LongType))
          val enc = org.apache.spark.sql.Encoders.row(schema)
          subRows.mapPartitions { rows =>
            val bs = bc.value
            rows.map { r =>
              val mIdx = r.getInt(0)
              val qv = r.getSeq[Long](1).toArray
              org.apache.spark.sql.Row(mIdx, r.get(1),
                argminQ(qv, 0, qv.length, bs(mIdx)))
            }
          }(enc)
        }
      val sums = assigned
        .groupBy(col("m"), col("cell"))
        .agg(org.apache.spark.sql.graft.VectorMeanAgg
          .vector_sum_long(col("qv")).as("sn"))
        .select(col("m"), col("cell"), col("sn.sums"), col("sn.n"))
        .collect()
      val updated = sums.map { r =>
        (r.getInt(0), r.getLong(1)) -> r.getSeq[Long](2).map(_ / r.getLong(3)).toArray
      }.toMap
      books = books.zipWithIndex.map { case (cents, i) =>
        cents.map { case (cid, qc) => (cid, updated.getOrElse((i, cid), qc)) }
      }
    }
    books
  }

  /** PQ encode: a quantized vector becomes M small codes — per
    * subspace, the id of the nearest codebook centroid (inline argmin
    * over literal codebooks, tie → smaller code id, identical to
    * [[assignCellsQ]]'s struct-min). A pure projection: no shuffle, no
    * join — at corpus scale encoding is one scan, and everything
    * downstream touches only the code table (M bytes/vector instead of
    * the full vector — the memory-bandwidth compression that makes
    * billion-vector search feasible). */
  def pqEncode(qv: Column, books: Seq[Seq[(Long, Array[Long])]],
               subDim: Int): Column =
    array(books.zipWithIndex.map { case (cents, m) =>
      val sub = slice(qv, lit(m * subDim + 1), lit(subDim))
      array_min(array(cents.map { case (cid, qc) =>
        struct(l2sqLong(sub, array(qc.map(lit): _*)).as("d"),
          lit(cid).as("cid"))
      }: _*)).getField("cid")
    }: _*)

  /** Per-probe ADC lookup TABLE: lut(m)(k) = exact integer L2² between
    * the probe's m-th subvector and codeword k — the precompute real
    * PQ scanners run so the code scan is M table lookups per
    * candidate instead of M sub-vector distance computations.
    * Driver-side over the bounded probe set (same decision class as
    * broadcast builds); pairs with [[pqAdcDistLut]]. */
  def pqAdcLut(probeQv: Seq[Long],
               books: Seq[Seq[(Long, Array[Long])]],
               subDim: Int): Seq[Seq[Long]] =
    books.zipWithIndex.map { case (cents, m) =>
      val sub = probeQv.slice(m * subDim, (m + 1) * subDim)
      cents.sortBy(_._1).map { case (_, qc) =>
        sub.iterator.zip(qc.iterator).map { case (a, b) =>
          val d = a - b; d * d
        }.sum
      }
    }

  /** ADC via the precomputed per-probe LUT column (`array<array
    * <bigint>>` from [[pqAdcLut]], broadcast with the probes): the
    * candidate-side cost is M nested `element_at` lookups — no slice
    * allocations, no per-row subvector arithmetic. Same exact integers
    * as [[pqAdcDist]] (property-pinned in OperatorsSpec). */
  def pqAdcDistLut(lut: Column, codes: Column, m: Int): Column =
    (0 until m).map { i =>
      element_at(element_at(lut, i + 1),
        element_at(codes, i + 1).cast("int") + 1)
    }.reduce(_ + _)

  /** PQ asymmetric distance (ADC): Σ over subspaces of the exact
    * integer L2² between the PROBE's subvector and the CANDIDATE's
    * codeword. The codebooks are literals, so per (probe, candidate)
    * this is pure column arithmetic — the probe side never builds an
    * explicit distance table and the candidate side never decodes. */
  def pqAdcDist(pqv: Column, codes: Column,
                books: Seq[Seq[(Long, Array[Long])]], subDim: Int): Column =
    books.zipWithIndex.map { case (cents, m) =>
      val sub = slice(pqv, lit(m * subDim + 1), lit(subDim))
      val code = element_at(codes, m + 1)
      // codeword lookup by id: books are dense 0..K-1 after training
      // (ids never change, only coordinates), so element_at by code+1
      // against the id-ordered literal table is the lookup
      val table = array(cents.sortBy(_._1).map { case (_, qc) =>
        array(qc.map(lit): _*) }: _*)
      l2sqLong(sub, element_at(table, (code + 1).cast("int")))
    }.reduce(_ + _)

  /** Bucket-width sizing rule for hyperplane LSH: the smallest nBits
    * whose 2^nBits buckets hold an EXPECTED population of at most
    * `targetBucketPop` (uniform spread), floored at minBits. The width
    * must come from the corpus count, not a constant: a fixed 8-bit
    * bucket means per-bucket population — and so the per-bucket
    * pair-join cost — grows linearly with the corpus. ~64 rows/bucket
    * keeps the in-bucket exact re-rank cheap (64² = 4k dot products)
    * while leaving buckets dense enough for recall. */
  def deriveNBits(corpusSize: Long, targetBucketPop: Int = 64,
                  minBits: Int = 8, maxBits: Int = 30): Int =
    Sizing.bucketBits(corpusSize, targetBucketPop, minBits, maxBits)

  /** Exchange width for a bucket-local pair join that feeds a
    * pair-sized sort (window top-k): the partial WindowGroupLimit
    * sorts the JOIN OUTPUT per task, and a per-task sort that
    * outgrows its execution-memory share falls off the in-memory
    * cliff into external-sort spilling — measured at the 4M ladder
    * rung (SCALING.md §4.11): the top-3 tail went 1.3 s at 1M vectors
    * to 31 s at 2M (24× for 2× pairs) at the default 32-way width,
    * and 15.6 s once the pair join ran 256-wide. Expected pair rows ≈
    * nRows × capPop (the observed-population cap bounds every bucket),
    * ~48 B per sort row; 64 MB per-task budget, same rationale as
    * [[graft.operators.Dedup.fatJoinWidth]]. None at or below the
    * session default — oracle-SF plans untouched. */
  /** ~48 B per pair-sort row: two longs + a long score + the unsafe-row
    * and sorter-pointer overhead, measured at the §4.12 rung. */
  private val PairSortRowBytes = 48.0

  def pairJoinWidth(spark: org.apache.spark.sql.SparkSession,
                    nRows: Long, capPop: Int): Option[Int] =
    Sizing.exchangeWidth(spark, nRows, capPop * PairSortRowBytes)

  /** Equal-width bit bands of an LSH bucket id: nBands values of
    * bitsPerBand bits each. Banding turns one exact nBits bucket into
    * nBands OR'd match keys (any shared band ⇒ candidate) — higher
    * recall at the same bounded per-key population. */
  def bucketBands(bucket: Column, bitsPerBand: Int, nBands: Int): Column =
    array((0 until nBands).map(b =>
      shiftright(bucket, b * bitsPerBand).bitwiseAND(lit((1L << bitsPerBand) - 1))): _*)

  /** Distinct candidate pairs (id_a < id_b) agreeing on every groupCol
    * AND at least one LSH band of bucketCol. This is the scale-safe
    * replacement for a bare `join(..., groupCols)` pair join: a group
    * key (label, source, …) has no population bound — a popular group
    * is a quadratic block and a hot shuffle key at corpus scale — while
    * the (group ++ band) composite key cuts every group into
    * 2^bitsPerBand sub-buckets whose size the hyperplanes, not the
    * data skew, control. SQL twin: [[graft.queries.SimilaritySql]].
    *
    * `refineQvCol`: when set (to the quantized-vector column's name),
    * the banded keys get the same OBSERVED-population skew control as
    * [[skewSafeBucketKeys]] — a (group, band, band_val) population is
    * n_group / 2^bitsPerBand in expectation, which grows LINEARLY with
    * the corpus (band width is fixed), so at scale every banded key is
    * a quadratic block; measured on the ScaleGen corpus, see
    * SCALING.md §4.3. Hot keys are refined by [[refineHotKeys]]; cold
    * keys keep sub = 0 and produce the exact unrefined pair set, which
    * is why the small-SF oracle twins need no SQL change. */
  def bandedCandidatePairs(vecs: DataFrame, groupCols: Seq[String],
                           idCol: String, bucketCol: String,
                           bitsPerBand: Int, nBands: Int,
                           refineQvCol: Option[String] = None,
                           dims: Int = 64, capPop: Int = 256,
                           maxExtraBits: Int = 8): DataFrame = {
    val (keyed, keys) = bandedKeyed(vecs, groupCols, idCol, bucketCol,
      bitsPerBand, nBands, refineQvCol, dims, capPop, maxExtraBits, Nil)
    val a = keyed.withColumnRenamed("_pid", "id_a")
    val b = keyed.withColumnRenamed("_pid", "id_b")
    a.join(b, keys).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** [[bandedCandidatePairs]] that also SCORES each pair, inside the
    * band-local join. The two-phase form — pair ids first, then two
    * joins back to the corpus to fetch both payloads — reshuffles
    * |pairs| rows of payload width, and pairs outnumber vectors by the
    * bucket cap: measured at the 1M-doc rung, ~50 GB of 512-byte
    * embedding rows through the pair-id joins (SCALING.md §4.4).
    * Scoring while both payloads are ALREADY co-located in the band
    * shuffle leaves only (id_a, id_b, score) — 24 bytes — for the
    * dedup aggregate; the payload never moves again. Band-duplicated
    * pairs score twice (bounded by nBands) and collapse via max — the
    * score is a pure function of the pair, so all copies are equal and
    * the result set is exactly the two-phase one's. */
  def bandedScoredPairs(vecs: DataFrame, groupCols: Seq[String],
                        idCol: String, bucketCol: String,
                        payloadCol: String,
                        score: (Column, Column) => Column,
                        bitsPerBand: Int, nBands: Int,
                        refineQvCol: Option[String] = None,
                        dims: Int = 64, capPop: Int = 256,
                        maxExtraBits: Int = 8): DataFrame = {
    val (keyed, keys) = bandedKeyed(vecs, groupCols, idCol, bucketCol,
      bitsPerBand, nBands, refineQvCol, dims, capPop, maxExtraBits,
      carryCols = Seq(payloadCol))
    val a = keyed.select(keys.map(col) :+ col("_pid").as("id_a")
      :+ col(payloadCol).as("_pa"): _*)
    val b = keyed.select(keys.map(col) :+ col("_pid").as("id_b")
      :+ col(payloadCol).as("_pb"): _*)
    a.join(b, keys).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), score(col("_pa"), col("_pb")).as("score"))
      .groupBy("id_a", "id_b").agg(max(col("score")).as("score"))
  }

  /** Per-node BEST in-band neighbor — (src, dst) where dst maximizes
    * `score` over all of src's band-bucket co-residents (score desc,
    * dst asc on ties; exactly [[topKPerKey]] k=1 over the
    * [[bandedScoredPairs]] graph, parity spec-pinned). The window form
    * materializes the deduplicated pair set (one groupBy over |pairs|),
    * unions both directions (2·|pairs| rows) and sorts them per node —
    * three full pair-sized exchanges before anything shrinks. Here each
    * bucket-local pair is scored ONCE, leaves the join as two
    * (node, candidate) rows via a codegen'd explode, and the hash
    * aggregate's map-side combine collapses to one row per node BEFORE
    * the only shuffle: pair-sized work stays inside the scan stage and
    * only |nodes| rows ever cross the wire. Duplicate pair copies
    * (a pair sharing several bands / refined sub-buckets) carry equal
    * scores, so the min-struct is copy-count-invariant — the same
    * argument that lets bandedScoredPairs collapse copies by max. */
  def bandedTop1Neighbor(vecs: DataFrame, groupCols: Seq[String],
                         idCol: String, bucketCol: String,
                         payloadCol: String,
                         score: (Column, Column) => Column,
                         bitsPerBand: Int, nBands: Int,
                         refineQvCol: Option[String] = None,
                         dims: Int = 64, capPop: Int = 256,
                         maxExtraBits: Int = 8): DataFrame = {
    val (keyed, keys) = bandedKeyed(vecs, groupCols, idCol, bucketCol,
      bitsPerBand, nBands, refineQvCol, dims, capPop, maxExtraBits,
      carryCols = Seq(payloadCol))
    val a = keyed.select(keys.map(col) :+ col("_pid").as("id_a")
      :+ col(payloadCol).as("_pa"): _*)
    val b = keyed.select(keys.map(col) :+ col("_pid").as("id_b")
      :+ col(payloadCol).as("_pb"): _*)
    // min(struct(-score, dst)) == (score desc, dst asc) lexicographic
    a.join(b, keys).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), score(col("_pa"), col("_pb")).as("_s"))
      .select(explode(array(
        struct(col("id_a").as("src"),
          struct((-col("_s")).as("ns"), col("id_b").as("dst")).as("best")),
        struct(col("id_b").as("src"),
          struct((-col("_s")).as("ns"), col("id_a").as("dst")).as("best"))))
        .as("e"))
      .groupBy(col("e.src").as("src"))
      .agg(min(col("e.best")).as("_best"))
      // sign-flip recovery is exact for longs (scores never approach
      // MinValue) and for doubles (negation flips only the sign bit)
      .select(col("src"), col("_best.dst").as("dst"),
        (-col("_best.ns")).as("score"))
  }

  /** Shared core of the banded pair operators: explode bucketCol into
    * (band, band_val) keys, optionally refine hot keys
    * ([[refineHotKeys]]), and carry `carryCols` payloads through.
    * Returns (rows keyed by the result keys with the id as `_pid`,
    * the pair-join key names). */
  private def bandedKeyed(vecs: DataFrame, groupCols: Seq[String],
                          idCol: String, bucketCol: String,
                          bitsPerBand: Int, nBands: Int,
                          refineQvCol: Option[String], dims: Int,
                          capPop: Int, maxExtraBits: Int,
                          carryCols: Seq[String]): (DataFrame, Seq[String]) = {
    val carry = (refineQvCol.toSeq ++ carryCols).distinct
    val banded = vecs.select(
      groupCols.map(col) ++ carry.map(col) ++ Seq(
        col(idCol).as("_pid"),
        posexplode(bucketBands(col(bucketCol), bitsPerBand, nBands))
          .as(Seq("band", "band_val"))): _*)
    val keys0 = groupCols ++ Seq("band", "band_val")
    refineQvCol match {
      case Some(qv) =>
        // extra hyperplanes start past the bucket's own bit family
        val r = refineHotKeys(banded, keys0, "_pid", qv, dims,
          offset = bitsPerBand * nBands, capPop, maxExtraBits)
        (if (carryCols.contains(qv)) r else r.drop(qv), keys0 :+ "sub")
      case None => (banded, keys0)
    }
  }

  /** LSH bucketing by random-hyperplane signs (the ANN scale path):
    * deterministic hyperplanes derived from fixed integer coefficients.
    * nBits sign bits → bucket id; neighbor search then joins within
    * buckets only. At 1000 executors this turns the O(n²) pair space
    * into per-bucket blocks co-located by the bucket-key shuffle.
    * `offset` selects a disjoint hyperplane family (bits offset..
    * offset+nBits-1) — used by [[skewSafeBucketKeys]] to refine hot
    * buckets with hyperplanes independent of the ones that formed
    * them. */
  def hyperplaneBucket(vec: Column, dims: Int, nBits: Int,
                       offset: Int = 0): Column = {
    // hyperplane h, component i: pseudo-random fixed weight in [-500, 500]
    def w(h: Int, i: Int): Int = {
      val v = (1103515245L * (h * dims + i + 12345) + 54321) % 1001
      (v - 500).toInt
    }
    val bits = (0 until nBits).map { h =>
      val weights = array((0 until dims).map(i => lit(w(offset + h, i).toLong)): _*)
      val proj = graft.functions.VectorFunctions.dot_long(vec, weights)
      when(proj > 0, lit(1L << h)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** SKEW-SAFE bucket keys for the in-bucket pair join: real embedding
    * corpora are clustered, and a dense region collapses into one LSH
    * bucket no matter how `deriveNBits` widens the bucket space —
    * measured on the ScaleGen corpus at 250k vectors: the top 1% of
    * buckets carried 92% of all candidate pairs (588M pairs where a
    * uniform spread would produce 15M), turning the bucket-local join
    * quadratic exactly where the data is densest. The expected-
    * population sizing rule cannot see this; the OBSERVED per-bucket
    * population must drive the plan.
    *
    * Two observed-population passes, each a tiny aggregate broadcast
    * back to the rows (the key spaces are bounded: pass 1 by 2^nBits,
    * pass 2 by 2^nBits + n/capPop, since a hot bucket of pop rows
    * contributes ~pop/capPop refined keys):
    *
    *  1. a bucket with pop > capPop gets `ceil(log2(pop/capPop))`
    *     (capped at maxExtraBits) EXTRA hyperplane bits from a
    *     disjoint family (`offset = nBits`) — computed as
    *     `length(bin((pop-1) div capPop))`, pure integer/codegen
    *     arithmetic — splitting dense regions whose members still
    *     differ enough to land on both sides of a fresh hyperplane;
    *  2. the RESIDUAL population of each (bucket, refined) key is
    *     re-measured, and whatever still exceeds the cap — a
    *     degenerate pile of near-identical vectors that no hyperplane
    *     can separate — is salted on the vector id down to ~capPop.
    *     Members of such a pile are interchangeable as ANN neighbors,
    *     so sharding them trades no meaningful recall for a hard cost
    *     bound.
    *
    * Cold buckets keep sub = 0 through both passes and are
    * byte-identical to the unrefined plan — which is why the small-SF
    * oracle, where no bucket exceeds the cap, pins the exact same
    * results.
    *
    * Input must carry (idCol, qv). Output: input + bucket, sub. */
  def skewSafeBucketKeys(emb: DataFrame, idCol: String, dims: Int,
                         nBits: Int, capPop: Int = 256,
                         maxExtraBits: Int = 8): DataFrame = {
    val b = emb.withColumn("bucket", hyperplaneBucket(col("qv"), dims, nBits))
    refineHotKeys(b, Seq("bucket"), idCol, "qv", dims, offset = nBits,
      capPop, maxExtraBits)
  }

  /** The two observed-population passes of [[skewSafeBucketKeys]],
    * generalized to ANY join-key set over rows that carry a quantized
    * vector — the shared skew-control core of the bucketed
    * (`ann_lsh_topk`) and banded (`vpe_similar_topk`,
    * `dedup_embed_neardup`) pair spaces. Adds column `sub` (0 for
    * every key whose population is within `capPop` — the common case,
    * and the reason small-SF oracle results are unchanged); callers
    * append `sub` to their pair-join key. `offset` must point past the
    * hyperplane family that produced the incoming keys so refinement
    * bits are independent of them. */
  def refineHotKeys(df: DataFrame, keyCols: Seq[String], idCol: String,
                    qvCol: String, dims: Int, offset: Int,
                    capPop: Int = 256, maxExtraBits: Int = 8): DataFrame =
    refineHotKeysBy(df, keyCols, idCol,
      hyperplaneBucket(col(qvCol), dims, maxExtraBits, offset = offset),
      capPop, maxExtraBits)

  /** [[refineHotKeys]] with a PLUGGABLE refinement-bit source — the
    * shared observed-population core, generalized past quantized
    * vectors so the MinHash band keys can refine on extra MinHash
    * bits (`HashExpressions.minhash_extra_bits`) the same way the
    * hyperplane buckets refine on extra hyperplane signs. `extraBits`
    * must be a long column whose low `maxExtraBits` bits are
    * (approximately) independent of the bits that formed `keyCols`,
    * and on which true neighbors/duplicates mostly agree — that is
    * the recall contract of the split.
    *
    * Broadcast discipline: only keys OVER the cap are broadcast back
    * (left join + coalesce), never the full population table — for
    * band-shaped key spaces the distinct-key count is corpus-sized
    * (mostly singletons) while the hot set is bounded by n/capPop.
    *
    * `saltCol` shards the residual still-hot piles (default: the row
    * id — right when pile members are interchangeable, as ANN
    * neighbors are). A DEDUP caller passes a CONTENT hash instead so
    * true duplicates always land in the same shard (splitting a
    * duplicate pair loses a real result, not a redundant neighbor);
    * the flip side — a content-identical pile beyond the cap keeps
    * its quadratic pair space, because that pair space IS the output
    * for such data — is the caller's documented trade. */
  def refineHotKeysBy(df: DataFrame, keyCols: Seq[String], idCol: String,
                      extraBits: Column, capPop: Int,
                      maxExtraBits: Int,
                      saltCol: Option[Column] = None): DataFrame = {
    // ceil(log2(pop/cap)) in pure integer arithmetic: bit width of the
    // truncated quotient (bin() renders a bigint; its length IS
    // floor(log2)+1); 0 when within the cap (incl. the left-join-miss
    // sentinel pop = 1)
    def widthOver(pop: Column): Column = {
      val q = floor((pop - 1) / capPop).cast("long")
      when(q <= 0, 0).otherwise(length(bin(q))).cast("int")
    }
    val keys = keyCols.map(col)
    val hot = df.groupBy(keys: _*).agg(count(lit(1)).as("_pop"))
      .filter(col("_pop") > capPop)
    // cold corpus (no key over the cap — every oracle SF, and any
    // fixture below ~cap·keyspace rows): the refinement would be a
    // provable no-op, so skip its two broadcast joins and second
    // aggregate entirely. The probe is a driver-side action over the
    // hot-key aggregate (map-side combined; ≤ n/capPop surviving rows).
    if (hot.isEmpty)
      return df.withColumn("sub", lit(0L))
    val refined = df.join(broadcast(hot), keyCols, "left")
      .withColumn("_eb",
        least(widthOver(coalesce(col("_pop"), lit(1L))), lit(maxExtraBits)))
      .withColumn("_extra", extraBits)
      .withColumn("_sube", expr("_extra & (shiftleft(1L, _eb) - 1)"))
      .drop("_pop", "_extra")
    // pass 2 over the hot rows only: a key cold in pass 1 stays cold
    // (its population did not change), so its residual probe is free
    val hot2 = refined.filter(col("_eb") > 0)
      .groupBy((keys :+ col("_sube")): _*).agg(count(lit(1)).as("_pop2"))
      .filter(col("_pop2") > capPop)
    refined.join(broadcast(hot2), keyCols :+ "_sube", "left")
      .withColumn("_sb", widthOver(coalesce(col("_pop2"), lit(1L))))
      .withColumn("_salt", abs(saltCol.getOrElse(xxhash64(col(idCol)))))
      .withColumn("sub", expr(
        "shiftleft(_sube, _sb) | (_salt & (shiftleft(1L, _sb) - 1))"))
      .drop("_pop2", "_sb", "_salt", "_sube", "_eb")
  }
}
