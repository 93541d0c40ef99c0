package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Deterministic large-corpus fixture generator for the scale proofs
  * (SCALING.md). Writes `documents` / `embeddings` / `events` parquet
  * with the exact schemas of the driver testdata, at sizes the shipped
  * SFs never reach (~10^6 docs), so the flagship dedup / ANN / packing /
  * streaming-state paths can be MEASURED past the point where a
  * quadratic or skew bug would hide.
  *
  * Everything is a pure function of the row id (splitmix64-derived), so
  * any executor can generate any partition independently and two runs
  * produce bit-identical tables — no checked-in data, no RNG state.
  *
  * The corpus is adversarial on purpose:
  *  - exact duplicates: ids ≡ 6 (mod 8) repeat the text of id-1;
  *  - near duplicates: ids ≡ 7 (mod 8) mutate ~4% of the tokens of
  *    id-2 (each mutation kills ~9 character 5-shingles, leaving
  *    shingle-Jaccard ≈ 0.7-0.9 — above the 0.5 clustering threshold
  *    but far from exact);
  *  - duplicate CHAINS: ids ≡ 9..15 (mod 1024) each mutate their
  *    immediate predecessor, forming 8-deep components whose diameter
  *    forces connected-components past trivial 2-round convergence
  *    (the adaptive pointer jump's reason to exist);
  *  - embeddings: 64 soft clusters (0.4·centroid + uniform ±0.6 noise)
  *    — IVF cell assignment stays meaningful, but the noise dominates
  *    each hyperplane projection so LSH buckets split instead of
  *    collapsing into 64 quadratic point masses (the skew trap a
  *    clustered corpus sets for bucketed ANN);
  *  - events: uniform over 30 days of event time, unique event_id
  *    (the enrich-join state key — ~10^6 live RocksDB rows at the top
  *    size), user cardinality nEvents/4 (the completion/session key).
  */
object ScaleGen {

  case class Doc(doc_id: Long, text: String, lang: String, source: String,
                 n_chars: Long)
  case class Vec(vec_id: Long, embedding: Array[Float], label: Int)
  case class Ev(event_id: Long, ts: Long, user_id: Long, event_type: String,
                value: Double, props: String)

  /** splitmix64 finalizer — the one mixing primitive everything derives
    * from. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 3-8 char tokens, including the en language markers (the/and/of)
    * and none of the de/fr/es markers — generated docs predict "en"
    * and pass the curation quality gate like a real English corpus. */
  val vocab: Array[String] = Array(
    "the", "and", "of", "a", "key", "agg", "row", "scan", "slow", "fast",
    "table", "value", "part", "hash", "merge", "join", "query", "batch",
    "window", "spark", "order", "data", "column", "small", "line", "filter",
    "customer", "plan", "shuffle", "stage", "task", "node", "disk", "cache",
    "sort", "group", "count", "index", "range", "stream", "state", "store",
    "read", "write", "block", "page", "file", "byte")

  /** Zipf-ish head of the token distribution: one in five tokens is a
    * stopword, with the/a/of double-weighted (the quality signal's
    * markers and the en language markers, so predictLang and the
    * stopword quality score behave like on real English). */
  private val stopwords: Array[String] =
    Array("the", "the", "a", "of", "and", "to", "in", "is")

  /** A token from 64 bits of state: 20% a stopword, ~70% a vocab word
    * with a 16-bit hex suffix (~3M distinct "rare" words), ~10% a bare
    * vocab word. The dominant rare tail is what makes the shingle
    * universe realistic: with only 48 distinct words, unrelated docs
    * share so many character 5-shingles that MinHash bands collide
    * with CONSTANT pair probability — an O(n²) spurious-candidate
    * count no real corpus has (measured on earlier fixture versions:
    * candidate pairs per doc grew 0.8 → 2.9 from 20k to 125k docs;
    * with this distribution the per-doc rate is flat). Spurious band
    * collisions scale with the square of the cross-doc shingle
    * Jaccard, so the fix is distributional: shrink the shared-shingle
    * pool (stopword/common runs) relative to each doc's distinct set. */
  private def token(s: Long): String = {
    val r = (s >>> 21) & 0xff
    if (r < 51) stopwords(((s >>> 33) % stopwords.length).toInt)
    else {
      val w = vocab(((s >>> 33) % vocab.length).toInt)
      if (r < 230) w + java.lang.Integer.toHexString(((s >>> 40) & 0xffff).toInt)
      else w
    }
  }

  private def rawTokens(seed: Long): Array[String] = {
    val n = (60L + ((mix(seed * 3 + 1) >>> 8) % 60)).toInt // 60..119 tokens
    var s = mix(seed)
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      token(s)
    }
  }

  /** Replace ~1 in 25 tokens, positions and replacements keyed by the
    * mutating doc's id — deterministic, length-preserving. */
  private def mutate(tokens: Array[String], id: Long): Array[String] =
    tokens.zipWithIndex.map { case (w, t) =>
      if (((mix(id ^ (0x9e3779b9L * t + 1)) >>> 8) % 25) == 0)
        token(mix(id * 131 + t))
      else w
    }

  /** Token stream of doc `id` under the duplicate taxonomy above.
    * Recursion depth is bounded by the chain length (≤ 8) plus one
    * dup hop. */
  def docTokens(id: Long): Array[String] = {
    val m1024 = id % 1024
    if (m1024 >= 9 && m1024 <= 15) mutate(docTokens(id - 1), id)
    else (id % 8) match {
      case 6 if id >= 6 => docTokens(id - 1)          // exact duplicate
      case 7 if id >= 7 => mutate(docTokens(id - 2), id) // near duplicate
      case _            => rawTokens(id)
    }
  }

  def docRow(id: Long): Doc = {
    val text = docTokens(id).mkString(" ")
    val langPick = (mix(id * 7 + 5) >>> 10) % 10
    val lang =
      if (langPick == 0) "de" else if (langPick == 1) "fr"
      else if (langPick == 2) "es" else "en"
    Doc(id, text, lang, "src" + ((mix(id * 11 + 3) >>> 12) % 100),
      text.length.toLong)
  }

  val Dims = 64
  val NCentroids = 64

  private def centroidVal(c: Int, j: Int): Float =
    (((mix(c * 1000003L + j) >>> 13) % 2001L) - 1000L) / 1000.0f

  def vecRow(id: Long): Vec = {
    val c = ((mix(id * 13 + 7) >>> 9) % NCentroids).toInt
    val emb = Array.tabulate(Dims) { j =>
      val noise = (((mix(id * 17 + j * 29 + 3) >>> 13) % 1201L) - 600L) / 1000.0f
      0.4f * centroidVal(c, j) + noise
    }
    Vec(id, emb, c % 10)
  }

  private val EventTypes =
    Array("click", "purchase", "signup", "view", "scroll")
  private val TsMinNs = 1704067200000000000L           // 2024-01-01 UTC
  private val SpanNs = 30L * 24 * 3600 * 1000000000L   // 30 days

  def evRow(id: Long, nUsers: Long): Ev = Ev(
    event_id = id,
    ts = TsMinNs + (mix(id * 23 + 11) >>> 1) % SpanNs,
    user_id = (mix(id * 29 + 17) >>> 9) % nUsers,
    event_type = EventTypes(((mix(id * 31 + 19) >>> 11) % EventTypes.length).toInt),
    value = ((mix(id * 37 + 23) >>> 15) % 100000L) / 100.0,
    props = s"""{"k":${id % 10}}""")

  /** Generate the three tables under `dir` unless an up-to-date marker
    * says this exact configuration is already there. Partition count
    * scales with size so generation parallelizes and downstream scans
    * see multi-split files (the testdata's single-split shape is the
    * small-SF exception, not the rule). */
  def ensure(spark: SparkSession, dir: String, nDocs: Long, nVecs: Long,
             nEvents: Long): Unit = {
    val marker = Paths.get(dir, "_SCALE_OK")
    val stamp = s"v5 docs=$nDocs vecs=$nVecs events=$nEvents"
    if (Files.isRegularFile(marker) &&
        new String(Files.readAllBytes(marker), StandardCharsets.UTF_8) == stamp)
      return
    import spark.implicits._
    val parts = math.max(8, math.min(64, (nDocs / 50000).toInt))
    spark.range(0, nDocs, 1, parts).map(i => docRow(i))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.range(0, nVecs, 1, parts).map(i => vecRow(i))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val nUsers = math.max(nEvents / 4, 1)
    spark.range(0, nEvents, 1, parts).map(i => evRow(i, nUsers))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Files.createDirectories(marker.getParent)
    Files.write(marker, stamp.getBytes(StandardCharsets.UTF_8))
  }
}
