package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.graft.HashExpressions
import graft.functions.HashFunctions

/** Equivalence proofs for the native hash kernels against their
  * declarative higher-order-function twins (the forms the DuckDB
  * oracles mirror). Each test evaluates BOTH forms over the same
  * generated corpus — including unicode, empties, repeats, and
  * consecutive/leading/trailing spaces — and requires bit equality.
  */
class HashKernelsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // HOF twins (the original column formulations, kept here as the
  // executable spec of the kernel semantics)
  private def hofShingleHashes(text: Column, k: Int): Column =
    transform(
      array_distinct(transform(
        sequence(lit(1), greatest(length(text) - lit(k - 1), lit(1))),
        i => text.substr(i, lit(k)))),
      g => HashFunctions.hash32(g))

  private def hofTokenHashes(text: Column): Column =
    transform(split(text, " "), t => HashFunctions.hash32(t))

  private def hofMinHashSig(hs: Column, j: Int): Column = {
    val (a, b) = HashFunctions.MinHashCoeffs(j)
    array_min(transform(hs, h => HashFunctions.affineHash(h, a, b)))
  }

  private def hofSimHash(th: Column): Column = {
    val bitCols = (0 until 32).map { b =>
      val votes = aggregate(th, lit(0L),
        (acc, h) => acc + shiftright(h, b).bitwiseAND(1) * 2 - 1)
      when(votes > 0, lit(1L << b)).otherwise(0L)
    }
    bitCols.reduce(_ + _)
  }

  private def hofFingerprint(text: Column): Column =
    aggregate(transform(split(text, " "), t => HashFunctions.hash32(t)),
      lit(0L), (acc, h) => (acc + h) % lit(2305843009213693951L))

  private val corpus: Seq[String] = Seq(
    "", " ", "  ", "a", "ab", "abcd", "abcde", "abcdef",
    "the quick brown fox jumps over the lazy dog",
    "aaaaaaaaaaaaaaaa", // all-duplicate shingles
    " leading space", "trailing space ", "double  space",
    "tab\tand\nnewline chars",
    "ünïcødé strïng with ümläuts", "日本語のテキストです",
    "mixed ascii 日本語 and ünïcødé", "émoji 🙂 in 🙂 text",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z"
  ) ++ (0 until 50).map(i => s"synthetic doc $i " + ("lorem ipsum " * (i % 7)))

  private lazy val docs = corpus.toDF("text").repartition(3).cache()

  private def assertSame(name: String, kernel: Column, hof: Column): Unit = {
    val diff = docs
      .select(col("text"), kernel.as("k"), hof.as("h"))
      .filter(not(col("k") <=> col("h")))
      .collect()
    assert(diff.isEmpty,
      s"$name kernel != HOF for: ${diff.map(_.getString(0)).take(3).mkString(" | ")}")
  }

  test("shingle_hash32 kernel ≡ transform(array_distinct(shingles), hash32)") {
    assertSame("shingle_hash32",
      HashExpressions.shingle_hash32(col("text"), 5),
      hofShingleHashes(col("text"), 5))
    // non-default k too
    assertSame("shingle_hash32(k=2)",
      HashExpressions.shingle_hash32(col("text"), 2),
      hofShingleHashes(col("text"), 2))
  }

  test("token_hash32 kernel ≡ transform(split(text,' '), hash32)") {
    assertSame("token_hash32",
      HashExpressions.token_hash32(col("text")),
      hofTokenHashes(col("text")))
  }

  test("minhash_sigs kernel ≡ per-coefficient array_min(transform(affine))") {
    val hs = HashExpressions.shingle_hash32(col("text"), 5)
    assertSame("minhash_sigs",
      HashExpressions.minhash_sigs(hs),
      array(HashFunctions.MinHashCoeffs.indices.map(j => hofMinHashSig(hs, j)): _*))
  }

  test("minhash_extra_bits kernel ≡ packed low bits of per-family array_min") {
    val hs = HashExpressions.shingle_hash32(col("text"), 5)
    val twin = coalesce(
      HashFunctions.MinHashExtraCoeffs.zipWithIndex.map { case ((a, b), j) =>
        shiftleft(array_min(transform(hs,
          h => HashFunctions.affineHash(h, a, b))).bitwiseAND(lit(1L)), j)
      }.reduce(_ + _),
      lit(0L)) // empty shingle set: kernel packs 0, array_min is null
    assertSame("minhash_extra_bits",
      HashExpressions.minhash_extra_bits(hs), twin)
  }

  test("extra coefficient family is disjoint from the signature family and well-formed") {
    val primary = HashFunctions.MinHashCoeffs.toSet
    val extra = HashFunctions.MinHashExtraCoeffs
    assert(extra.size == 16)
    assert(extra.toSet.size == 16, "extra coefficients must be distinct")
    assert(extra.forall { case (a, _) => a != 0 },
      "a ≡ 0 mod p degenerates the hash to a constant")
    assert(extra.map(_._1).toSet.intersect(primary.map(_._1).toSet).isEmpty,
      "refinement bits must be independent of the band-forming family")
  }

  test("minhash_sigs of an empty hash array is null (array_min semantics)") {
    val r = spark.range(1)
      .select(HashExpressions.minhash_sigs(array().cast("array<long>")).as("s"))
      .collect()
    assert(r.head.isNullAt(0))
  }

  test("simhash32 kernel ≡ 32 aggregate bit votes") {
    val th = HashExpressions.token_hash32(col("text"))
    assertSame("simhash32",
      HashExpressions.simhash32(th), hofSimHash(th))
  }

  test("content_fingerprint kernel ≡ aggregate sum-mod fold") {
    assertSame("content_fingerprint",
      HashExpressions.content_fingerprint(col("text")),
      hofFingerprint(col("text")))
  }

  test("l2sq_long kernel ≡ aggregate(zip_with) on equal-length arrays") {
    val a = transform(sequence(lit(1), lit(64)), i => (i * 37 % 101 - 50).cast("long"))
    val b = transform(sequence(lit(1), lit(64)), i => (i * 53 % 97 - 48).cast("long"))
    val hof = aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)
    val diff = spark.range(100)
      .select(HashExpressions.l2sq_long(a, b).as("k"), hof.as("h"))
      .filter(not(col("k") <=> col("h"))).count()
    assert(diff == 0)
  }

  test("l2sq_long of mismatched-length arrays is null (zip_with twin semantics)") {
    val a = sequence(lit(1L), lit(5L))
    val b = sequence(lit(1L), lit(4L))
    val r = spark.range(1)
      .select(HashExpressions.l2sq_long(a, b).as("m"),
        HashExpressions.l2sq_long(a, a).as("ok"))
      .collect().head
    assert(r.isNullAt(0))
    assert(r.getLong(1) == 0L)
  }

  test("repetition_stats kernel ≡ explode→groupBy twin") {
    // the declarative twin (the DuckDB oracle's formulation)
    val tokens = docs.withColumn("rid", monotonically_increasing_id())
    val twin = tokens
      .select(col("rid"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("rid", "tok").agg(count(lit(1)).as("n"))
      .groupBy("rid")
      .agg(sum("n").as("n_tokens"), count(lit(1)).as("n_distinct"),
        expr("CAST(max(n) * 10000 DIV sum(n) AS BIGINT)").as("top_share_bp"))
    val kern = tokens.select(col("rid"),
      HashExpressions.repetition_stats(col("text")).as("r"))
      .select(col("rid"), col("r.n_tokens"), col("r.n_distinct"),
        col("r.top_share_bp"))
    val diff = kern.as("k").join(twin.as("t"), "rid")
      .filter(not(col("k.n_tokens") <=> col("t.n_tokens")) ||
        not(col("k.n_distinct") <=> col("t.n_distinct")) ||
        not(col("k.top_share_bp") <=> col("t.top_share_bp")))
      .count()
    assert(diff == 0, "repetition_stats kernel disagrees with explode twin")
  }

  test("regex_redact kernel ≡ (size(split)-1, regexp_replace) twin") {
    val pat = "[0-9]{3}-[0-9]{2,4}-[0-9]{4}|[0-9]{7,}"
    val piiCorpus = corpus ++ Seq(
      "call 555-12-3456 now", "1234567", "123456", "12345678901234567890",
      "55512345675551234567", // adjacent long runs
      "555-12-3456555-1234-3456", // adjacent phone matches
      "edge 999-99-9999", "999-99-9999 leading match", "")
    val docs2 = piiCorpus.toDF("text")
    val kern = org.apache.spark.sql.graft.HashExpressions
      .regex_redact(col("text"), pat, "[PII]")
    val diff = docs2
      .select(col("text"),
        kern.getField("n_redacted").as("kn"),
        kern.getField("redacted").as("kr"),
        (size(split(col("text"), pat, -1)) - 1).cast("long").as("tn"),
        regexp_replace(col("text"), pat, "[PII]").as("tr"))
      .filter(not(col("kn") <=> col("tn")) || not(col("kr") <=> col("tr")))
      .collect()
    assert(diff.isEmpty,
      s"regex_redact != twin for: ${diff.map(_.getString(0)).take(3).mkString(" | ")}")
  }

  test("sorted_inter_size ≡ size(array_intersect) on sorted distinct arrays") {
    // the Jaccard hot-loop kernel vs the builtin twin, over randomized
    // set pairs in the kernel's precondition domain (ascending,
    // distinct) — including empty, disjoint, identical, and
    // negative-heavy (the shifted-int encoding) shapes
    val rnd = new scala.util.Random(42)
    val cases = (0 until 300).map { i =>
      def gen(n: Int) =
        Seq.fill(n)(rnd.nextInt(200) - 100).distinct.sorted
      (gen(rnd.nextInt(60)), gen(rnd.nextInt(60)))
    } ++ Seq((Seq.empty[Int], Seq.empty[Int]), (Seq(1, 2, 3), Seq.empty[Int]),
      (Seq(-5, 0, 5), Seq(-5, 0, 5)), (Seq(Int.MinValue), Seq(Int.MinValue)))
    val df = cases.toDF("a", "b")
    val diff = df.select(
        org.apache.spark.sql.graft.HashExpressions
          .sorted_inter_size(col("a"), col("b")).as("k"),
        size(array_intersect(col("a"), col("b"))).as("t"))
      .filter(not(col("k") <=> col("t"))).count()
    assert(diff == 0, "sorted_inter_size disagrees with array_intersect")
  }

  test("kernels survive whole-stage codegen and SQL registration") {
    graft.functions.VectorFunctions.register(spark)
    // exercise the codegen path explicitly (collect forces evaluation
    // through WholeStageCodegen at default conf)
    val n = docs.select(
      HashExpressions.simhash32(HashExpressions.token_hash32(col("text"))).as("s"),
      HashExpressions.content_fingerprint(col("text")).as("f"))
      .filter(col("s") >= 0 && col("f") >= 0).count()
    assert(n == docs.count())
  }
}
