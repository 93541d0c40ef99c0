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
