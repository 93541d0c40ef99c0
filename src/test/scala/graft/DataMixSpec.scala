package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-6 mixture/vocab/LM/centroid operators that
  * the value-hash oracle can't express: rate semantics, monotone
  * coverage, and conservation laws that must hold at ANY corpus size
  * (the oracle pins exact values at one SF; these pin the algebra). */
class DataMixSpec extends AnyFunSuite {
  import SparkTestSession._

  test("domain mix: full-rate sources keep everything, others never exceed rate semantics") {
    val rows = SparkEntry.queries("pipeline_domain_mix")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rate, total, kept) = (r.getAs[Long]("rate_bp"),
        r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"))
      assert(kept <= total, s"$r")
      if (rate == 10000L) assert(kept == total, s"full-rate source sampled: $r")
      if (rate == 0L) assert(kept == 0L, s"zero-rate source leaked: $r")
    }
    // the policy table must produce more than one distinct rate or the
    // mixture degenerates to a plain sample
    assert(rows.map(_.getAs[Long]("rate_bp")).distinct.length > 1)
  }

  test("vocab: ranks contiguous, counts non-increasing, coverage monotone and <= 100%") {
    val rows = SparkEntry.queries("text_vocab")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to rows.length).toSeq)
    val ns = rows.map(_.getAs[Long]("n")).toSeq
    assert(ns == ns.sorted.reverse, "counts must be non-increasing in rank")
    val cov = rows.map(_.getAs[Long]("cum_frac_bp")).toSeq
    assert(cov == cov.sorted, "coverage must be monotone")
    assert(cov.last <= 10000L)
  }

  test("ngram LM: every doc with >=2 tokens is scored, scores >= 1 (self-count floor)") {
    val scored = SparkEntry.queries("text_ngram_lm")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(scored.length == nDocs, "every multi-token doc must be scored")
    scored.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") >= 1L)
      // a bigram's corpus count includes its own occurrence, so the
      // average corpus frequency can never fall below 1
      assert(r.getAs[Long]("lm_score") >= 1L, s"$r")
    }
  }

  test("BPE fold merge equals the greedy skip-2 reference walk") {
    // the walking reference: scan left to right, fuse non-overlapping
    // (l, r) adjacencies, skip 2 on a fuse
    def greedy(syms: Seq[String], l: String, r: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(42)
    // multi-char symbols included on purpose: boundary confusion (e.g.
    // [b, ab] vs pair (b, a)) is where a string-level formulation breaks
    val alphabet = Vector("a", "b", "ab", "ba", "aa")
    val cases = Seq.tabulate(300) { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(8))(alphabet(rnd.nextInt(alphabet.size))))
    }
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = cases.toDF("id", "syms")
    for (l <- Seq("a", "b", "aa"); r <- Seq("a", "b", "ab")) {
      val got = df
        .select(col("id"),
          graft.operators.TextAnalysis.bpeMergeOnce(col("syms"), l, r).as("m"))
        .as[(Long, Seq[String])].collect().toMap
      cases.foreach { case (id, syms) =>
        assert(got(id) == greedy(syms, l, r),
          s"fold diverged from greedy: syms=$syms pair=($l,$r) got=${got(id)}")
      }
    }
  }

  test("BPE merge training: K ranked rules with non-increasing counts") {
    val rows = SparkEntry.queries("text_bpe_merges")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("merge_rank")).toSeq == (1L to rows.length).toSeq)
    val counts = rows.map(_.getAs[Long]("pair_count")).toSeq
    // merging the argmax pair can only reduce or preserve other pairs'
    // counts, and new pairs are bounded by the merged pair's count —
    // so the learned sequence is non-increasing
    assert(counts == counts.sorted.reverse, s"counts=$counts")
    rows.foreach { r =>
      assert(r.getAs[String]("lhs").nonEmpty && r.getAs[String]("rhs").nonEmpty)
    }
  }

  test("BPE local trainer arm equals the distributed loop (round-13 strategy switch)") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    // the REAL corpus vocabulary at the test SF, trained by both arms
    val vocab = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val local = TextAnalysis.bpeTrainLocal(
      TextAnalysis.bpeLocalVocab(vocab).get, 3)
    // distributed reference: the exact pre-round-13 loop
    var state = vocab.select(col("w"), col("n"),
      filter(split(col("w"), ""), x => x =!= "").as("syms")).cache()
    val distMerges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (k <- 1 to 3) {
      val best = state
        .select(col("n"), explode(TextAnalysis.adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()(0)
      distMerges += ((k.toLong, best.getAs[String]("l"),
        best.getAs[String]("r"), best.getAs[Long]("cnt")))
      val next = state.withColumn("syms",
        TextAnalysis.bpeMergeOnce(col("syms"),
          best.getAs[String]("l"), best.getAs[String]("r"))).cache()
      state.unpersist()
      state = next
    }
    assert(local._1 == distMerges.toSeq,
      s"merge tables diverge: local=${local._1} dist=${distMerges.toSeq}")
    // final per-word symbol arrays agree too (the encode consumer)
    val distState = state.select(col("w"), col("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    state.unpersist()
    local._2.foreach { case (w, syms) =>
      assert(distState(w) == syms.toSeq, s"word '$w' state diverges")
    }
    assert(local._2.length == distState.size)
  }

  test("centroid sums: vector counts conserve the corpus per dim") {
    val rows = SparkEntry.queries("embed_centroids")(spark, sf).collect()
    val nVecs = Tables.embeddings(spark, sf).count()
    val dims = rows.map(_.getAs[Long]("dim")).distinct.sorted.toSeq
    assert(dims == (1L to dims.length).toSeq, "dims must be contiguous from 1")
    // per dim, the label partition must cover every vector exactly once
    rows.groupBy(_.getAs[Long]("dim")).foreach { case (dim, rs) =>
      assert(rs.map(_.getAs[Long]("n_vecs")).sum == nVecs,
        s"dim $dim does not conserve the corpus")
    }
  }
}
