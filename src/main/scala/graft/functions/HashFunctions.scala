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
