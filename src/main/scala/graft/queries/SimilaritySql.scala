package graft.queries

/** DuckDB-SQL twins of the [[graft.operators.Similarity]] vector
  * kernels, shared by every oracle that quantizes, buckets, or pairs
  * embeddings (PipelineQueries + DataPipelineQueries). One source for
  * the hyperplane-weight formula keeps the Spark and oracle sides from
  * drifting.
  */
private[queries] object SimilaritySql {

  /** Twin of Similarity.quantize over the `embedding` column. */
  val quantizeSql: String =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"

  /** Twin of Similarity.hyperplaneBucket over a `qv` list column
    * (integer-exact: same fixed LCG-derived weights both sides). */
  def lshBucketSql(dims: Int = 64, nBits: Int = 8): String = {
    def w(h: Int, i: Int): Long =
      (1103515245L * (h * dims + i + 12345) + 54321) % 1001 - 500
    (0 until nBits).map { h =>
      val weights = (0 until dims).map(i => w(h, i)).mkString("[", ", ", "]")
      s"(CASE WHEN list_sum(list_transform(list_zip(qv, $weights), z -> z[1] * z[2])) > 0 THEN ${1L << h} ELSE 0 END)"
    }.mkString(" + ")
  }

  /** CTE `nb(nbits)`: twin of Similarity.deriveNBits over `table`'s
    * row count — smallest b with targetBucketPop·2^b ≥ count, clamped
    * to [minBits, maxBits]. Integer arithmetic both sides. */
  def deriveNBitsCte(table: String, targetBucketPop: Int = 64,
                     minBits: Int = 8, maxBits: Int = 30): String =
    s"""nb AS (SELECT GREATEST($minBits, LEAST($maxBits,
       |  CAST(COALESCE(list_min(list_filter(range(0, ${maxBits + 1}),
       |    b -> (CAST($targetBucketPop AS BIGINT) << b) >= n)), $maxBits) AS INTEGER))) AS nbits
       |  FROM (SELECT count(*) AS n FROM $table))""".stripMargin

  /** Dynamic-width twin of Similarity.hyperplaneBucket over a `qv`
    * column, reading the width from CTE `nb` ([[deriveNBitsCte]]) so
    * the oracle tracks the corpus-sized plan at ANY scale factor —
    * weights come from the same LCG formula, generated inline per
    * hyperplane instead of unrolled. Verified bit-equal to the static
    * unrolled form. */
  def lshBucketDynSql(dims: Int = 64): String =
    s"""CAST(list_sum(list_transform(range(0, (SELECT nbits FROM nb)), h ->
       |  CASE WHEN list_sum(list_transform(range(0, $dims),
       |    i2 -> qv[i2 + 1] * ((1103515245 * (h * $dims + i2 + 12345) + 54321) % 1001 - 500))) > 0
       |  THEN (CAST(1 AS BIGINT) << h) ELSE 0 END)) AS BIGINT)""".stripMargin

  /** CTE chain `bq` → `banded` → `cand`: banded LSH sub-bucket
    * candidate pairs — twin of Similarity.bandedCandidatePairs. The
    * source CTE must provide (vec_id, qv, groupKeys...); `cand` yields
    * DISTINCT (id_a, id_b) with id_a < id_b sharing every group key
    * and at least one band of the hyperplane bucket. */
  def bandedCandCtes(srcCte: String, groupKeys: Seq[String],
                     bitsPerBand: Int = 4, nBands: Int = 2): String = {
    val mask = (1L << bitsPerBand) - 1
    val keyEq = (groupKeys.map(k => s"a.$k = b.$k") ++ Seq(
      "a.band = b.band", "a.band_val = b.band_val",
      "a.vec_id < b.vec_id")).mkString(" AND ")
    val keySel = ("vec_id" +: groupKeys).mkString(", ")
    s"""bq AS (SELECT *, CAST(${lshBucketSql()} AS BIGINT) AS bucket FROM $srcCte),
       |banded AS (
       |  SELECT $keySel, b.band, (bucket >> (b.band * $bitsPerBand)) & $mask AS band_val
       |  FROM bq, (SELECT unnest(range(0, $nBands)) AS band) b),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM banded a JOIN banded b ON $keyEq)""".stripMargin
  }
}
