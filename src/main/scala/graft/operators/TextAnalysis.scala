package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.HashFunctions._

/** Text-analysis operators for training-data pipelines: token/char
  * statistics, quality scoring, language-ID heuristic, content
  * fingerprinting. All pure column arithmetic (codegen'd, no UDF), and
  * integer-exact where a DuckDB oracle checks them.
  */
object TextAnalysis {

  /** Whitespace token count: spaces + 1 (exact integer; avoids engine
    * differences in split-on-empty semantics). */
  def tokenCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, " ", "")) + 1).cast("long")

  /** Number of non-overlapping occurrences of `needle` (literal string
    * replace, not regex — faster and byte-identical to the SQL twin). */
  def countOccurrences(text: Column, needle: String): Column =
    ((length(text) - length(call_function("replace", text, lit(needle), lit(""))))
      / needle.length).cast("long")

  /** Mean token length in basis points ((chars-without-spaces * 10000)
    * div tokens) — integer-exact. */
  def avgTokenLenBp(text: Column): Column =
    floor((length(text) - (tokenCount(text) - 1)) * 10000 / tokenCount(text)).cast("long")

  /** Stopword ratio in basis points: occurrences of ' the '/' a '/' of '
    * per token. Integer-exact quality signal. */
  def stopwordBp(text: Column): Column = {
    val hits = countOccurrences(text, " the ") +
      countOccurrences(text, " a ") + countOccurrences(text, " of ")
    floor(hits * 10000 / tokenCount(text)).cast("long")
  }

  /** Composite quality score in basis points: weighted blend of
    * stopword presence and token-length sanity (tokens of length 3-8
    * considered "normal"; proxied by mean token length distance from
    * 5). Deterministic integer arithmetic. */
  def qualityScoreBp(text: Column): Column = {
    val stop = least(stopwordBp(text), lit(2000L))
    val lenPenalty =
      least(floor(abs(avgTokenLenBp(text) - 50000L) / 10).cast("long"), lit(5000L))
    (lit(5000L) + stop * 2 - lenPenalty).cast("long")
  }

  /** N-gram language-ID heuristic: score each candidate language by
    * counting its marker tokens, pick the argmax (deterministic
    * tie-break by fixed language order). The marker lists are the
    * usual tiny-stopword sets. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " die ", " und "),
    "fr" -> Seq(" le ", " la ", " et "),
    "es" -> Seq(" el ", " los ", " y "))

  def langScore(text: Column, lang: String): Column =
    langMarkers.toMap.apply(lang)
      .map(m => countOccurrences(text, m))
      .reduce(_ + _)

  def predictLang(text: Column): Column = {
    val scored = langMarkers.map { case (l, _) => (l, langScore(text, l)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
  }

  /** GPT-2-style pre-tokenizer pattern, restricted to the
    * lookahead-free subset whose semantics are identical in Java regex
    * (Spark) and RE2 (DuckDB): contraction suffixes, then
    * optional-leading-space letter / digit / other runs. Both engines
    * use leftmost-first alternation, and no alternative can match
    * empty, so repeated-find extraction agrees byte-for-byte. */
  val BpePattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  /** BPE-ish token count: number of pre-tokenizer matches — the
    * standard proxy for LLM token budgets (whitespace tokens
    * undercount code/punctuation-heavy text). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0))).cast("long")

  /** Order-insensitive 61-bit content fingerprint: sum of token hash32
    * values mod 2^61-1. Integer-exact, engine-portable; native one-pass
    * kernel ([[org.apache.spark.sql.graft.ContentFingerprint]]). */
  def contentFingerprint(text: Column): Column =
    org.apache.spark.sql.graft.HashExpressions.content_fingerprint(text)

  // ---- BPE merge training ---------------------------------------------

  /** Symbol-list separator for the BPE fold (below). U+001F never
    * appears in tokenized corpus text (words are split on spaces and
    * control chars carry no merge information). */
  val BpeSep = "\u001f"

  /** Adjacent symbol pairs of an array column as (l, r) structs —
    * empty for arrays of fewer than 2 elements. */
  def adjacentPairs(syms: Column): Column =
    when(size(syms) > 1,
      transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("l"), element_at(syms, i + 1).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))

  /** One greedy left-to-right BPE merge applied to a symbol array: every
    * non-overlapping adjacent (left, right) occurrence fuses into one
    * symbol. Row-local fold (no shuffle): symbols are re-joined on
    * [[BpeSep]] while folding — the accumulator merges the incoming
    * symbol into its LAST segment iff that segment equals `left` and the
    * incoming symbol equals `right`. This fold is exactly the greedy
    * skip-2 walk: a merge changes the last segment to left+right, which
    * can never equal `left` again (right is non-empty), so chained runs
    * like "aaa" resolve to [aa, a] — property-pinned against a walking
    * reference in DataMixSpec. The DuckDB twin states the SAME fold via
    * list_reduce, so both engines share one formulation. */
  def bpeMergeOnce(syms: Column, left: String, right: String): Column =
    split(
      aggregate(
        slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
        element_at(syms, 1),
        (acc, x) =>
          when(regexp_extract(acc, "[^\u001f]*$", 0) === lit(left) && x === lit(right),
            concat(acc, x))
            .otherwise(concat(acc, lit(BpeSep), x))),
      BpeSep)

  // ---- driver-local BPE trainer (small-vocabulary strategy switch) ------

  /** Vocabulary-row budget for the DRIVER-LOCAL trainer arm: ≤ this
    * many distinct words train locally (one collect + K in-memory
    * rounds instead of 2K+ scheduled jobs over a cached vocab frame —
    * the per-round argmax job dominated the trainer at bench scale);
    * above it the distributed loop runs unchanged. 512k words ×
    * ~100 B ≈ 50 MB driver heap — the same bounded-collect class as
    * [[IndexLifecycle.boundedCollectIds]]. A 100-TB corpus vocabulary
    * (hundreds of millions of distinct words) stays on the
    * distributed arm by construction. */
  val LocalBpeVocabMax: Int = 512 * 1024

  /** Collect a (w, n) vocabulary frame for the local arm iff it fits
    * [[LocalBpeVocabMax]] — `limit(max+1)` is pushed into the plan, so
    * an over-budget vocabulary ships max+1 rows, not everything. */
  def bpeLocalVocab(vocab: org.apache.spark.sql.DataFrame): Option[Array[(String, Long)]] = {
    val rows = vocab.limit(LocalBpeVocabMax + 1).collect()
    if (rows.length > LocalBpeVocabMax) None
    else Some(rows.map(r => (r.getString(0), r.getLong(1))))
  }

  /** UTF-8 unsigned-byte string ordering — exactly Spark's UTF8String
    * binary comparison, so the local argmax tie-break matches the
    * distributed `orderBy(cnt desc, l, r)` byte-for-byte (plain
    * String.compareTo diverges on supplementary characters). */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** One greedy left-to-right merge — the EXACT local twin of
    * [[bpeMergeOnce]]'s fold (merging rewrites the last segment to
    * left+right, which can never equal `left` again; "aaa" → [aa, a]).
    * Equivalence is property-pinned in DataMixSpec. */
  private[graft] def bpeMergeOnceLocal(syms: Array[String], left: String,
                                       right: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      val x = syms(i)
      if (out.nonEmpty && out(out.length - 1) == left && x == right)
        out(out.length - 1) = left + x
      else out += x
      i += 1
    }
    out.toArray
  }

  /** Driver-local BPE training: `rounds` greedy merges over a
    * collected (word, count) vocabulary. Returns the merge table
    * (rank, l, r, pair_count) and the final per-word symbol arrays —
    * the SAME results as the distributed loop (weighted adjacent-pair
    * counts, argmax by (count desc, l, r) in UTF-8 byte order, greedy
    * fold per round), without its 2×rounds scheduled jobs. Symbols
    * start as the word's single-char splits (split-on-empty minus
    * empties, identical to the Column form). */
  def bpeTrainLocal(vocab: Array[(String, Long)], rounds: Int):
      (Seq[(Long, String, String, Long)], Array[(String, Array[String])]) = {
    var words: Array[(String, Array[String], Long)] = vocab.map { case (w, n) =>
      (w, w.split("").filter(_.nonEmpty), n)
    }
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    for (k <- 1 to rounds) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (_, syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val key = (syms(i), syms(i + 1))
          counts.update(key, counts.getOrElse(key, 0L) + n)
          i += 1
        }
      }
      require(counts.nonEmpty,
        "BPE training needs at least one 2-symbol word")
      val ((bl, br), cnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }(
        Ordering.Tuple3(Ordering.Long,
          Ordering.fromLessThan(utf8Lt), Ordering.fromLessThan(utf8Lt)))
      merges += ((k.toLong, bl, br, cnt))
      // encode consumers need the FINAL state, so the last round's
      // merge is applied too (the distributed merges-only loop skips
      // it — its callers never read the state after the last argmax)
      words = words.map { case (w, syms, n) =>
        (w, bpeMergeOnceLocal(syms, bl, br), n)
      }
    }
    (merges.result(), words.map { case (w, syms, _) => (w, syms) })
  }
}
