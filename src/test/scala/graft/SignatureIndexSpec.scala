package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, SignatureIndex}

import scala.jdk.CollectionConverters._

/** The persisted incremental-dedup signature index (round-9 item):
  * build-once / probe-per-increment must (a) reproduce the in-memory
  * across and self frames exactly on a cold corpus, (b) never rewrite
  * or re-hash the corpus at probe time, (c) keep true duplicates
  * findable under frozen hot-key refinement, and (d) plan the corpus
  * side as a broadcast-semi-pruned scan, not a corpus-sized shuffle.
  */
class SignatureIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  private def newIndexDir(): String = {
    val d = Files.createTempDirectory("graft_test_sigidx_")
    Dedup.registerScratchDir(d)
    d.toString
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  private lazy val hashed = Dedup.shingleHashSets(
      Tables.documents(spark, sf), "doc_id", "text", 5)
    .withColumn("bucket",
      pmod(graft.functions.HashFunctions.hash32(col("doc_id").cast("string")),
        lit(100)))
  private lazy val inc = hashed.filter(col("bucket") >= 90).drop("bucket")
  private lazy val corpus = hashed.filter(col("bucket") < 90).drop("bucket")

  test("indexed probe equals the in-memory across frame on a cold corpus") {
    val idx = newIndexDir()
    SignatureIndex.buildSignatureIndex(corpus, idx)
    val expected = canon(Dedup.lshJaccardPairsAcross(inc, corpus, 4))
    assert(expected.nonEmpty, "fixture must produce cross pairs")
    assert(canon(SignatureIndex.probeSignatureIndex(inc, idx)) == expected)
  }

  test("index-served self pairs equal the live one-pass frame") {
    val idx = newIndexDir()
    val all = hashed.drop("bucket")
    SignatureIndex.buildSignatureIndex(all, idx)
    val expected = canon(Dedup.lshJaccardPairs(all, 4, onePassMinDocs = 0))
    assert(expected.nonEmpty)
    assert(canon(SignatureIndex.selfPairsFromIndex(spark, idx)) == expected)
  }

  test("delete hides a doc from every consumer immediately; rebuild reclaims") {
    val all = hashed.drop("bucket")
    val idx = newIndexDir()
    SignatureIndex.buildSignatureIndex(all, idx)
    val del = all.filter(col("doc_id") % 10 === 3).select(col("doc_id"))
    val meta = SignatureIndex.deleteFromIndex(del, idx)
    assert(meta.deletedDocs == del.count() && meta.deletedDocs > 0)
    // ground truth: the live pair frame over the surviving docs
    val survivors = all.filter(col("doc_id") % 10 =!= 3)
    val expectPairs = canon(Dedup.lshJaccardPairs(survivors, 4,
      onePassMinDocs = 0))
    assert(expectPairs.nonEmpty)
    assert(canon(SignatureIndex.selfPairsFromIndex(spark, idx))
      == expectPairs)
    // the across probe also sees only survivors: no pair may name a
    // deleted doc as its corpus side
    val probed = SignatureIndex.probeSignatureIndex(inc, idx)
    assert(probed.join(del, probed("id_old") === del("doc_id"),
      "left_semi").isEmpty)
    // retrying the delete is duplicate-safe AND counter-exact
    val meta2 = SignatureIndex.deleteFromIndex(del, idx)
    assert(meta2.deletedDocs == meta.deletedDocs &&
      meta2.nDocs == meta.nDocs)
    assert(canon(SignatureIndex.selfPairsFromIndex(spark, idx))
      == expectPairs)
    // the staged pair graph was invalidated and restages from liveSig
    assert(canon(SignatureIndex.clustersFromIndex(spark, idx)
      .join(del, Seq("doc_id"), "left_semi")).isEmpty,
      "a deleted doc surfaced in clusters")
    // a REBUILD at the same path reclaims: stale tombstones must not
    // erase rebuilt docs sharing a previously-deleted doc_id
    SignatureIndex.buildSignatureIndex(all, idx)
    assert(!Files.isDirectory(Paths.get(idx, "tombstones")))
    assert(canon(SignatureIndex.selfPairsFromIndex(spark, idx)) ==
      canon(Dedup.lshJaccardPairs(all, 4, onePassMinDocs = 0)))
  }

  test("rebuild drops a stale staged-pairs marker") {
    val all = hashed.drop("bucket")
    val idx = newIndexDir()
    SignatureIndex.buildSignatureIndex(all, idx)
    // stage pairs over the PRE-rebuild corpus
    SignatureIndex.ensureSelfPairs(spark, idx)
    assert(Files.isRegularFile(Paths.get(idx, "pairs", "_PAIRS_OK")))
    // rebuild over a DIFFERENT corpus slice: serving the old staged
    // graph would hand clustersFromIndex edges of evicted docs
    SignatureIndex.buildSignatureIndex(
      all.filter(col("doc_id") % 2 === 0), idx)
    assert(!Files.isRegularFile(Paths.get(idx, "pairs", "_PAIRS_OK")),
      "rebuild served the previous corpus' staged pair graph")
  }

  test("probing never rewrites the persisted corpus signatures") {
    val idx = newIndexDir()
    SignatureIndex.buildSignatureIndex(corpus, idx)
    def sigState(): Seq[(String, Long, Long)] =
      scala.util.Using.resource(Files.walk(Paths.get(idx, "sig")))(
        _.iterator().asScala
          .filter(Files.isRegularFile(_)).toSeq
          .map(p => (p.toString, Files.size(p),
            Files.getLastModifiedTime(p).toMillis)).sortBy(_._1))
    val before = sigState()
    val r1 = canon(SignatureIndex.probeSignatureIndex(inc, idx))
    val r2 = canon(SignatureIndex.probeSignatureIndex(inc, idx))
    assert(r1 == r2, "probe must be deterministic")
    assert(sigState() == before,
      "a probe rewrote the persisted signature table")
  }

  test("frozen hot-key refinement never loses true duplicate pairs") {
    import spark.implicits._
    // 40 corpus copies + 5 increment copies of one text: the shared
    // band buckets blow far past capPop = 4, forcing pass-1 refinement
    // AND the pass-2 content-salt path — and because every copy shares
    // _xb and _salt (pure functions of the shingle set), the frozen
    // split must keep all 200 cross pairs at jaccard 10000
    val dupText = "the quick brown fox jumps over the lazy dog again and again"
    val corpusDocs = ((0L until 40L).map(i => (i, dupText)) ++
      (100L until 120L).map(i => (i, s"unique corpus document number $i with enough text to shingle"))).toDF("doc_id", "text")
    val incDocs = ((1000L until 1005L).map(i => (i, dupText)) ++
      (1100L until 1103L).map(i => (i, s"fresh increment document $i nothing like the corpus"))).toDF("doc_id", "text")
    val idx = newIndexDir()
    SignatureIndex.buildSignatureIndex(
      Dedup.shingleHashSets(corpusDocs, "doc_id", "text", 5), idx,
      capPop = 4, maxExtraBits = 4)
    val got = SignatureIndex.probeSignatureIndex(
        Dedup.shingleHashSets(incDocs, "doc_id", "text", 5), idx)
      .filter(col("jaccard_bp") === 10000)
      .select(col("id_new"), col("id_old"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for (n <- 1000L until 1005L; o <- 0L until 40L)
      yield (n, o)).toSet
    assert(expected.subsetOf(got),
      s"frozen refinement lost ${(expected -- got).size} duplicate pairs")
  }

  test("probe plan: corpus leg is semi-pruned by broadcast, increment builds the hash join") {
    val idx = newIndexDir()
    SignatureIndex.buildSignatureIndex(corpus, idx)
    val p = SignatureIndex.probeSignatureIndex(inc, idx)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("LeftSemi"),
      s"corpus prune missing from the probe plan:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"increment band keys are not broadcast:\n$p")
    assert(p.contains("ShuffledHashJoin"),
      s"pair join is not SHUFFLE_HASH:\n$p")
  }

  test("staged pair graph: clusters off the index equal the live CC frame; pairs build once") {
    val idx = newIndexDir()
    val all = hashed.drop("bucket")
    SignatureIndex.buildSignatureIndex(all, idx)
    val expected = canon {
      val strong = Dedup.lshJaccardPairs(all, 4)
        .filter(col("jaccard_bp") >= 5000).select(col("id_a"), col("id_b"))
      Dedup.connectedComponents(
        Tables.documents(spark, sf).select(col("doc_id")), "doc_id", strong)
    }
    assert(expected.nonEmpty)
    assert(canon(SignatureIndex.clustersFromIndex(spark, idx)) == expected)
    // the pairs parquet is a build-once artifact: a second clustering
    // run must reread it, not rewrite it
    def pairsState(): Seq[(String, Long)] =
      scala.util.Using.resource(Files.walk(Paths.get(idx, "pairs")))(
        _.iterator().asScala
          .filter(p => Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet")).toSeq
          .map(p => (p.toString, Files.getLastModifiedTime(p).toMillis))
          .sortBy(_._1))
    val before = pairsState()
    assert(canon(SignatureIndex.clustersFromIndex(spark, idx)) == expected)
    assert(pairsState() == before, "second clustering rewrote the staged pairs")
    // below-floor thresholds are a contract violation, not a silent wrong answer
    intercept[IllegalArgumentException] {
      SignatureIndex.clustersFromIndex(spark, idx, minJaccardBp = 1000)
    }
  }

  test("appendToIndex: post-append probe equals a fresh build; meta and pairs lifecycle") {
    // corpus A built, increment B appended: probing C against the
    // appended index must find exactly the pairs a FRESH build of
    // A ∪ B finds (cold corpus: no hot buckets at this scale, so the
    // frozen-population asymmetry is nil); bookkeeping must reflect
    // the drift and the staged pair graph must restage
    val a = hashed.filter(col("bucket") < 80).drop("bucket")
    val b = hashed.filter(col("bucket") >= 80 && col("bucket") < 90).drop("bucket")
    val c = inc
    val idxAppend = newIndexDir()
    val metaBuild = SignatureIndex.buildSignatureIndex(a, idxAppend)
    // staged pairs BEFORE the append — must be invalidated by it
    val pairsBefore = canon(SignatureIndex.ensureSelfPairs(spark, idxAppend))
    val metaAfter = SignatureIndex.appendToIndex(b, idxAppend)
    assert(metaAfter.nDocs == metaBuild.nDocs + b.count())
    assert(metaAfter.appendedDocs == b.count())
    assert(!SignatureIndex.needsRebuild(metaAfter),
      "a ~11% append must not demand a rebuild")
    assert(SignatureIndex.needsRebuild(
      metaAfter.copy(appendedDocs = metaBuild.nDocs / 2)),
      "drift past RebuildFraction must demand a rebuild")
    val idxFresh = newIndexDir()
    SignatureIndex.buildSignatureIndex(a.unionByName(b), idxFresh)
    assert(canon(SignatureIndex.probeSignatureIndex(c, idxAppend)) ==
      canon(SignatureIndex.probeSignatureIndex(c, idxFresh)),
      "post-append probe diverged from the fresh-build probe")
    // the pre-append pair graph was dropped; the restaged one equals
    // the fresh index's graph (and differs from the stale one unless
    // the appended slice contributed no strong pairs)
    val pairsAfter = canon(SignatureIndex.ensureSelfPairs(spark, idxAppend))
    assert(pairsAfter == canon(SignatureIndex.ensureSelfPairs(spark, idxFresh)),
      "restaged pair graph diverged from the fresh build")
    assert(pairsBefore.size <= pairsAfter.size)
  }

  test("gate through the index: md5 + band semantics vs the brute-force twin") {
    import spark.implicits._
    // corpus: a SHORT doc (< 5 tokens -> EMPTY shingle set, null
    // signature, NO band rows) plus normal docs; increment: an exact
    // copy of the short doc (must be rejected by the md5 sidecar —
    // the band checks cannot see it), a strong near-dup of a corpus
    // doc (rejected by a band), a weak overlap (admitted: jaccard <
    // 1/2), and a fresh doc (admitted)
    val longA = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val longANear = (1 to 28).map(i => s"alpha$i").mkString(" ") // jacc 28/30
    val weak = ((1 to 10).map(i => s"alpha$i") ++
      (1 to 40).map(i => s"beta$i")).mkString(" ")               // jacc < 1/2
    val corpusDf = Seq(
      (1L, "tiny doc", "en", "web"),
      (2L, longA, "en", "web"),
      (3L, (1 to 30).map(i => s"gamma$i").mkString(" "), "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val incDf = Seq(
      (10L, "tiny doc", "en", "web"),      // exact md5 dup of 1 -> reject
      (11L, longANear, "en", "web"),       // strong near-dup of 2 -> reject
      (12L, weak, "en", "web"),            // weak overlap -> admit
      (13L, (1 to 30).map(i => s"delta$i").mkString(" "), "en", "web"),
      (14L, "other tiny", "en", "web"))    // short but NOT a dup -> admit
      .toDF("doc_id", "text", "lang", "source")
    val idx = newIndexDir()
    SignatureIndex.buildSignatureIndex(
      Dedup.shingleHashSets(corpusDf, "doc_id", "text", 5), idx)
    SignatureIndex.ensureSidecar(idx, "gate_md5") { p =>
      corpusDf.select(md5(col("text")).as("c_md5")).distinct()
        .write.mode("overwrite").parquet(p)
    }
    val admitted = SignatureIndex.gateBatchThroughIndex(
      incDf, idx, keep = Seq("doc_id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(admitted == Seq(12L, 13L, 14L), s"admitted: $admitted")
  }

  test("gate plan: no sort-merge join anywhere, corpus scans broadcast-semi-pruned") {
    // the round-9 defect was a corpus-sized SORT per micro-batch; the
    // index-probe gate must execute with zero SortMergeJoins (every
    // join broadcast or shuffled-hash) and with the two corpus-side
    // scans (md5 sidecar, banded signatures) pruned by broadcast LEFT
    // SEMI joins before any exchange
    val idx = newIndexDir()
    SignatureIndex.buildSignatureIndex(corpus, idx)
    val corpusTexts = Tables.documents(spark, sf)
      .withColumn("bucket",
        pmod(graft.functions.HashFunctions.hash32(col("doc_id").cast("string")),
          lit(100)))
      .filter(col("bucket") < 90)
    SignatureIndex.ensureSidecar(idx, "gate_md5") { p =>
      corpusTexts.select(md5(col("text")).as("c_md5")).distinct()
        .write.mode("overwrite").parquet(p)
    }
    val incTexts = Tables.documents(spark, sf)
      .withColumn("bucket",
        pmod(graft.functions.HashFunctions.hash32(col("doc_id").cast("string")),
          lit(100)))
      .filter(col("bucket") >= 90)
      .select("doc_id", "text", "lang", "source")
    val (b, admitted) = SignatureIndex.gateBatchPlan(
      incTexts, idx, keep = Seq("doc_id", "lang", "source"))
    try {
      assert(admitted.count() > 0, "gate fixture admitted nothing")
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
        (p +: p.children.flatMap(allNodes)) ++ (p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            allNodes(a.executedPlan)
          case _ => Nil
        })
      val nodes = allNodes(admitted.queryExecution.executedPlan)
      val names = nodes.map(_.nodeName)
      assert(!names.exists(_.contains("SortMergeJoin")),
        s"gate executed a sort-merge join:\n${names.mkString("\n")}")
      val semis = nodes.count(n => n.nodeName.contains("BroadcastHashJoin") &&
        n.toString.contains("LeftSemi"))
      assert(semis >= 2,
        s"expected >=2 broadcast semi prunes, saw $semis:\n${names.mkString("\n")}")
    } finally b.unpersist()
  }

  test("compactSignatures merges append fragments without changing results") {
    val idx = newIndexDir()
    SignatureIndex.buildSignatureIndex(corpus, idx)
    // three appends fragment sig/ with increment-sized part files
    val slices = Seq((90, 93), (93, 96), (96, 100)).map { case (lo, hi) =>
      hashed.filter(col("bucket") >= lo && col("bucket") < hi).drop("bucket")
    }
    slices.foreach(SignatureIndex.appendToIndex(_, idx))
    val before = canon(SignatureIndex.selfPairsFromIndex(spark, idx))
    assert(before.nonEmpty)
    def nFiles(): Int =
      scala.util.Using.resource(Files.list(Paths.get(idx, "sig")))(
        _.iterator().asScala
          .count(_.getFileName.toString.endsWith(".parquet")))
    val filesBefore = nFiles()
    // a threshold below every file merges nothing and touches nothing
    assert(SignatureIndex.compactSignatures(spark, idx, minFileBytes = 1) == 0)
    assert(nFiles() == filesBefore)
    // a threshold above every file merges them all into one
    val merged = SignatureIndex.compactSignatures(spark, idx,
      minFileBytes = Long.MaxValue)
    assert(merged == filesBefore && nFiles() < filesBefore)
    assert(canon(SignatureIndex.selfPairsFromIndex(spark, idx)) == before)
    // meta bookkeeping refreshed to the compacted layout
    assert(SignatureIndex.readMeta(idx).sigBytes ==
      scala.util.Using.resource(Files.walk(Paths.get(idx, "sig")))(
        _.iterator().asScala
          .filter(p => Files.isRegularFile(p) &&
            p.getFileName.toString.endsWith(".parquet"))
          .map(Files.size).sum))
  }

  test("staged pairs survive deletes via the read-side filter, no restage") {
    val all = hashed.drop("bucket")
    val idx = newIndexDir()
    SignatureIndex.buildSignatureIndex(all, idx)
    SignatureIndex.ensureSelfPairs(spark, idx)
    def pairFiles(): Seq[(String, Long)] =
      scala.util.Using.resource(Files.list(Paths.get(idx, "pairs")))(
        _.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(p => (p.toString, Files.getLastModifiedTime(p).toMillis))
          .toSeq.sortBy(_._1))
    val before = pairFiles()
    SignatureIndex.deleteFromIndex(
      all.filter(col("doc_id") % 10 === 3).select(col("doc_id")), idx)
    assert(Files.isRegularFile(Paths.get(idx, "pairs", "_PAIRS_OK")),
      "delete must not invalidate the staged graph")
    // filtered read equals the LIVE pair computation over survivors
    val served = SignatureIndex.ensureSelfPairs(spark, idx)
    val got = canon(served)
    val live = canon(SignatureIndex.selfPairsFromIndex(spark, idx)
      .filter(col("jaccard_bp") >= 5000))
    assert(got.nonEmpty && got == live)
    // the filter is genuinely in the plan (the graph pre-dates the
    // delete, so the tombstone watermark mismatches) …
    val (fb, fs) = graft.operators.IndexLifecycle.antiJoinKinds(served)
    assert(fb || fs, "expected the tombstone anti-join in the served plan")
    // and nothing was restaged — the pair bytes are untouched
    assert(pairFiles() == before)
    // after a RESTAGE (post-delete), the watermark matches and the
    // filter is SKIPPED — no anti-join filtering ids that cannot be
    // present (the graph already comes from liveSig)
    Files.delete(Paths.get(idx, "pairs", "_PAIRS_OK"))
    val restaged = SignatureIndex.ensureSelfPairs(spark, idx)
    assert(canon(restaged) == live)
    val (rb, rs) = graft.operators.IndexLifecycle.antiJoinKinds(restaged)
    assert(!rb && !rs,
      "a post-delete restage must skip the tombstone filter")
  }

  test("ensureIndex caches by key and stamp") {
    val key = "spec_" + System.nanoTime()
    val p1 = SignatureIndex.ensureIndex(corpus, key)
    val meta1 = SignatureIndex.readMeta(p1)
    val p2 = SignatureIndex.ensureIndex(
      sys.error("second ensureIndex call must not re-evaluate the corpus"),
      key)
    assert(p1 == p2 && meta1.nDocs > 0)
    Dedup.registerScratchDir(Paths.get(p1))
  }

  test("deleting never-indexed ids is a TRUE no-op (counters and side table)") {
    import spark.implicits._
    val idx = newIndexDir()
    val before = SignatureIndex.buildSignatureIndex(corpus, idx)
    val foreign = (0L until 10L).map(_ + (1L << 41)).toDF("doc_id")
    val m1 = SignatureIndex.deleteFromIndex(foreign, idx)
    assert(m1.nDocs == before.nDocs && m1.deletedDocs == 0)
    assert(!Files.isDirectory(Paths.get(idx, "tombstones")))
    // mixed increment: exactly the present ids count
    val two = corpus.select(col("doc_id")).orderBy(col("doc_id")).limit(2)
    val m2 = SignatureIndex.deleteFromIndex(foreign.unionByName(two), idx)
    assert(m2.nDocs == before.nDocs - 2 && m2.deletedDocs == 2)
  }

  test("maintainIndex: drift fires a rebuild that reclaims tombstones; pairs equal a fresh build") {
    val all = hashed.drop("bucket")
    val idx = newIndexDir()
    SignatureIndex.buildSignatureIndex(all, idx)
    // delete ~30% — crosses RebuildFraction
    val del = all.filter(col("doc_id") % 10 < 3).select(col("doc_id"))
    SignatureIndex.deleteFromIndex(del, idx)
    assert(SignatureIndex.needsRebuild(SignatureIndex.readMeta(idx)),
      "fixture must cross the drift threshold")
    // the maintainer re-hashes from the SOURCE (the production
    // contract: a signature index is derived data; the sorted-stored
    // hsi cannot reproduce the text-order content salt) — tombstoned
    // docs are dropped from the supplied corpus inside
    val report = SignatureIndex.maintainIndex(spark, idx)(all)
    assert(report.rebuilt)
    assert(!Files.isDirectory(Paths.get(idx, "tombstones")))
    val meta = SignatureIndex.readMeta(idx)
    assert(meta.appendedDocs == 0 && meta.deletedDocs == 0)
    val survivors = all.filter(col("doc_id") % 10 >= 3)
    assert(meta.nDocs == survivors.count())
    val fresh = newIndexDir()
    SignatureIndex.buildSignatureIndex(survivors, fresh)
    assert(canon(SignatureIndex.selfPairsFromIndex(spark, idx)) ==
      canon(SignatureIndex.selfPairsFromIndex(spark, fresh)))
    // healthy after the rebuild: the next pass is a no-op
    assert(SignatureIndex.maintainIndex(spark, idx)(
      sys.error("a healthy index must not re-evaluate the corpus")) ==
      graft.operators.IndexLifecycle.Maintenance(rebuilt = false, 0))
  }

  test("a crashed signature rebuild resumes from staging; the corpus closure is untouched") {
    val all = hashed.drop("bucket")
    val idx = newIndexDir()
    SignatureIndex.buildSignatureIndex(all, idx)
    SignatureIndex.deleteFromIndex(
      all.filter(col("doc_id") % 10 < 3).select(col("doc_id")), idx)
    assert(SignatureIndex.needsRebuild(SignatureIndex.readMeta(idx)))
    // stage exactly what the maintainer stages (the tombstone-filtered
    // live corpus + marker) …
    val survivors = all.filter(col("doc_id") % 10 >= 3)
    val stageDir = Paths.get(idx, ".rebuild_live")
    survivors.write.mode("overwrite")
      .parquet(stageDir.resolve("rows").toString)
    val m = SignatureIndex.readMeta(idx)
    Files.write(stageDir.resolve("_STAGED_OK"),
      s"${m.nDocs}|${m.appendedDocs}|${m.deletedDocs}"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // … then simulate the worst crash window: the build already
    // destroyed the tombstone record (the only other place the
    // deletions were recorded)
    org.apache.commons.io.FileUtils.deleteDirectory(
      Paths.get(idx, "tombstones").toFile)
    // resume must come from the staging — re-evaluating the corpus
    // closure would RESURRECT the deleted docs (tombstones are gone)
    val report = SignatureIndex.maintainIndex(spark, idx)(
      sys.error("resume must not re-stage"))
    assert(report.rebuilt)
    assert(!Files.isDirectory(stageDir))
    val fresh = newIndexDir()
    SignatureIndex.buildSignatureIndex(survivors, fresh)
    assert(canon(SignatureIndex.selfPairsFromIndex(spark, idx)) ==
      canon(SignatureIndex.selfPairsFromIndex(spark, fresh)))
  }

  test("rebuild carries the gate-append md5 sidecar, filtered to survivors") {
    import spark.implicits._
    // the second-pass finding: a short admitted doc (null signature —
    // no band rows) is protected from exact re-ingest ONLY by its
    // gateapp_md5 row; a rebuild that dropped the sidecar would
    // re-admit copies. Conversely a TAKEN-DOWN admission's md5 must
    // stop rejecting (the content was deleted).
    val longA = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val longB = (1 to 30).map(i => s"beta$i").mkString(" ")
    val corpusDf = Seq((1L, longA, "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val idx = newIndexDir()
    SignatureIndex.buildSignatureIndex(
      Dedup.shingleHashSets(corpusDf, "doc_id", "text", 5), idx)
    SignatureIndex.ensureSidecar(idx, "gate_md5") { p =>
      corpusDf.select(md5(col("text")).as("c_md5")).distinct()
        .write.mode("overwrite").parquet(p)
    }
    def gate(rows: Seq[(Long, String)], bid: Long): Seq[Long] =
      SignatureIndex.gateAndAppendBatch(
        rows.map { case (id, t) => (id, t, "en", "web") }
          .toDF("doc_id", "text", "lang", "source"),
        idx, keep = Seq("doc_id"), batchId = bid)
        .collect().map(_.getLong(0)).sorted.toSeq
    assert(gate(Seq((10L, "tiny x"), (11L, longB)), 0) == Seq(10L, 11L))
    // take down admission 11; the tiny fixture is already past drift
    SignatureIndex.deleteFromIndex(Seq(11L).toDF("doc_id"), idx)
    assert(SignatureIndex.needsRebuild(SignatureIndex.readMeta(idx)))
    // the live document store: corpus + both admissions (maintain
    // drops the tombstoned one itself)
    val store = Seq((1L, longA), (10L, "tiny x"), (11L, longB))
      .toDF("doc_id", "text")
    val report = SignatureIndex.maintainIndex(spark, idx)(
      Dedup.shingleHashSets(store, "doc_id", "text", 5))
    assert(report.rebuilt)
    // exact copy of the surviving SHORT admission still rejects —
    // only the carried md5 row can do that
    assert(gate(Seq((20L, "tiny x")), 1) == Seq())
    // a copy of the taken-down admission is ADMITTED again: its sig
    // was reclaimed and its md5 row was filtered out with it
    assert(gate(Seq((21L, longB)), 2) == Seq(21L))
  }

  test("gateAndAppendBatch: later batches reject copies of earlier admissions; replays converge") {
    import spark.implicits._
    val longA = (1 to 30).map(i => s"alpha$i").mkString(" ")
    val fresh1 = (1 to 30).map(i => s"delta$i").mkString(" ")
    val fresh2 = (1 to 30).map(i => s"edge$i").mkString(" ")
    val near1 = (1 to 28).map(i => s"delta$i").mkString(" ") // jacc 28/30 of fresh1
    val corpusDf = Seq((1L, "tiny doc", "en", "web"), (2L, longA, "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val idx = newIndexDir()
    SignatureIndex.buildSignatureIndex(
      Dedup.shingleHashSets(corpusDf, "doc_id", "text", 5), idx)
    SignatureIndex.ensureSidecar(idx, "gate_md5") { p =>
      corpusDf.select(md5(col("text")).as("c_md5")).distinct()
        .write.mode("overwrite").parquet(p)
    }
    def gate(rows: Seq[(Long, String)], bid: Long): Seq[Long] =
      SignatureIndex.gateAndAppendBatch(
        rows.map { case (id, t) => (id, t, "en", "web") }
          .toDF("doc_id", "text", "lang", "source"),
        idx, keep = Seq("doc_id"), batchId = bid)
        .collect().map(_.getLong(0)).sorted.toSeq
    // batch 0: a corpus dup rejects, two fresh docs admit — including
    // an INTRA-BATCH duplicate pair (13 copies 12): both admit, since
    // the gate probes the index, not the in-flight batch
    val b0 = Seq((10L, longA), (11L, fresh1), (12L, "short new"),
      (13L, "short new"))
    assert(gate(b0, 0) == Seq(11L, 12L, 13L))
    // batch 1: EXACT copy of admission 12 rejects (md5 carry), STRONG
    // near-dup of admission 11 rejects (band carry), new doc admits
    assert(gate(Seq((20L, "short new"), (21L, near1), (22L, fresh2)), 1)
      == Seq(22L))
    // REPLAY of batch 0 (crash-redelivery, SAME batchId): the batch's
    // own previous appends are excluded, so the co-admitted
    // intra-batch twins 12/13 do NOT reject each other (the round-12
    // self-review hole) and the admitted set converges exactly
    assert(gate(b0, 0) == Seq(11L, 12L, 13L))
    // and a post-replay batch still rejects copies of the admissions
    assert(gate(Seq((30L, fresh2), (31L, (1 to 30).map(i => s"zeta$i")
      .mkString(" "))), 2) == Seq(31L))
  }
}
