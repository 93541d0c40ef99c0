package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing built from md5 — every
  * function here has an exact DuckDB twin (md5 is bit-identical across
  * engines, unlike xxhash64/murmur whose seeds differ), which is what
  * makes the dedup/fingerprint operators oracle-checkable.
  *
  * All arithmetic stays in Long (exact in both engines); no
  * floating-point enters any hash path.
  */
object HashFunctions {

  /** 32-bit hash of a string as a non-negative Long:
    * first 8 hex chars of md5, parsed base-16.
    * DuckDB twin: `CAST('0x' || substr(md5(s),1,8) AS UBIGINT)`. */
  def hash32(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 8), 16, 10).cast("long")

  /** Universal-hash family over 32-bit inputs:
    * h_a,b(x) = (a*x + b) mod p, p prime > 2^32.
    * Products stay < 2^63 for a <= ~2^30. */
  val MinHashPrime: Long = 4294967311L
  def affineHash(x: Column, a: Long, b: Long): Column =
    (x * lit(a) + lit(b)) % lit(MinHashPrime)

  /** Fixed MinHash coefficient table (seed-free, deterministic):
    * small odd multipliers + offsets. */
  val MinHashCoeffs: IndexedSeq[(Long, Long)] = IndexedSeq(
    (2654435761L % 1000003L, 17L), (2246822519L % 1000003L, 101L),
    (3266489917L % 1000003L, 379L), (668265263L % 1000003L, 1009L),
    (374761393L % 1000003L, 2003L), (2166136261L % 1000003L, 4001L),
    (16777619L % 1000003L, 8009L), (1540483477L % 1000003L, 16001L))

  /** DISJOINT second MinHash coefficient family — the refinement-bit
    * source for hot LSH band keys (the MinHash analog of the extra
    * hyperplane family `Similarity.refineHotKeys` draws on for
    * embedding buckets). Bit j of the refinement value is the low bit
    * of min over the shingle set of (a_j·h + b_j) mod p: documents
    * with IDENTICAL shingle sets always agree on every bit (exact
    * duplicates are never split apart), near-duplicates at Jaccard J
    * agree per bit with probability ≥ (1+J)/2 (they share the
    * minimizing shingle with probability J; otherwise a fair coin),
    * and unrelated documents that merely collided on one band agree
    * with probability ~1/2 per bit — which is what spreads a
    * saturated band bucket. */
  val MinHashExtraCoeffs: IndexedSeq[(Long, Long)] = IndexedSeq(
    (2971215073L % 1000003L, 31L), (433494437L % 1000003L, 131L),
    (1640531527L % 1000003L, 419L), (2178309L % 1000003L, 1021L),
    (3474701532L % 1000003L, 2053L), (1442695041L % 1000003L, 4099L),
    (40503L % 1000003L, 8191L), (2110823573L % 1000003L, 16127L),
    (2654437171L % 1000003L, 32003L), (2246823479L % 1000003L, 64007L),
    (3266490179L % 1000003L, 127031L), (668266163L % 1000003L, 254027L),
    (374762683L % 1000003L, 508037L), (2166137123L % 1000003L, 1016063L),
    (16778213L % 1000003L, 2032111L), (1540484609L % 1000003L, 4064197L))

  /** Character k-shingles of a string, as an array column.
    * Strings shorter than k yield a single shingle (the whole string). */
  def shingles(text: Column, k: Int): Column =
    transform(
      sequence(lit(1), greatest(length(text) - lit(k - 1), lit(1))),
      i => text.substr(i, lit(k)))

  /** MinHash signature element j over a distinct-shingle hash array. */
  def minHashSig(hashArr: Column, j: Int): Column = {
    val (a, b) = MinHashCoeffs(j)
    array_min(transform(hashArr, h => affineHash(h, a, b)))
  }
}
