package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IndexLifecycle

/** The shared index-lifecycle module: drift policy arithmetic, the
  * bounded fingerprint memo's eviction contract, and the content
  * fingerprint's sensitivity to renames (the rebuild-in-the-same-
  * millisecond staleness case size+mtime alone cannot see). */
class IndexLifecycleSpec extends AnyFunSuite {

  test("drift policy is the shared quarter-of-base-corpus rule") {
    // nTotal counts appends: base 100 + appended 25 = at threshold
    assert(!IndexLifecycle.driftExceeds(25, 125))
    assert(IndexLifecycle.driftExceeds(26, 126))
    assert(!IndexLifecycle.driftExceeds(0, 100))
  }

  test("fingerprint memo holds one live entry per stable key") {
    val memo = new IndexLifecycle.FingerprintMemo[String]
    var loads = 0
    def load(v: String): String = { loads += 1; v }
    assert(memo.get("k", "fp1")(load("a")) == "a")
    assert(memo.get("k", "fp1")(load("never")) == "a")
    assert(loads == 1)
    // fingerprint change: reload AND replace (no accumulation)
    assert(memo.get("k", "fp2")(load("b")) == "b")
    assert(loads == 2)
    // the old fingerprint's value is gone — a third state reloads
    assert(memo.get("k", "fp1")(load("c")) == "c")
    assert(loads == 3)
  }

  test("gate nProbe and compaction cadence policies are pinned") {
    // SCALING.md §4.18: planted-duplicate admit-error vs nProbe on the
    // √N-cell ladder index — exact re-ingests are caught at any width,
    // the strong near-dup band needs 16
    assert(graft.operators.AnnIndex.GateNProbe == 16)
    // SCALING.md §4.19: the measured probe-drag point was ~80 delta
    // files; the trigger fires at half
    assert(IndexLifecycle.CompactSmallFilesMax == 40)
    assert(!IndexLifecycle.needsCompaction(
      IndexLifecycle.CompactSmallFilesMax - 1))
    assert(IndexLifecycle.needsCompaction(
      IndexLifecycle.CompactSmallFilesMax))
  }

  test("ann needsCompaction counts delta part files") {
    val dir = Files.createTempDirectory("graft_test_nc_")
    try {
      // no delta at all: fresh build, nothing to compact
      assert(!graft.operators.AnnIndex.needsCompaction(dir.toString))
      val delta = dir.resolve("delta")
      Files.createDirectories(delta)
      (0 until IndexLifecycle.CompactSmallFilesMax - 1).foreach(i =>
        Files.write(delta.resolve(s"part-$i.parquet"), Array[Byte](1)))
      assert(!graft.operators.AnnIndex.needsCompaction(dir.toString))
      // tombstone part files count toward the same trigger: a
      // delete-only lifecycle pays the identical per-file drag
      val tomb = dir.resolve("tombstones")
      Files.createDirectories(tomb)
      Files.write(tomb.resolve("part-t.parquet"), Array[Byte](1))
      assert(graft.operators.AnnIndex.needsCompaction(dir.toString))
      Files.delete(tomb.resolve("part-t.parquet"))
      Files.write(delta.resolve("part-last.parquet"), Array[Byte](1))
      assert(graft.operators.AnnIndex.needsCompaction(dir.toString))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("signature needsCompaction counts small sig part files") {
    val dir = Files.createTempDirectory("graft_test_ncs_")
    try {
      val sig = dir.resolve("sig")
      Files.createDirectories(sig)
      (0 until IndexLifecycle.CompactSmallFilesMax).foreach(i =>
        Files.write(sig.resolve(s"part-$i.parquet"), Array[Byte](1)))
      assert(graft.operators.SignatureIndex.needsCompaction(dir.toString))
      // corpus-build parts above the size threshold never count
      assert(!graft.operators.SignatureIndex.needsCompaction(
        dir.toString, minFileBytes = 1))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("dir fingerprint sees a rename even with identical bytes+mtime") {
    val dir = Files.createTempDirectory("graft_test_fp_")
    try {
      val f = dir.resolve("part-0001.parquet")
      Files.write(f, Array[Byte](1, 2, 3))
      val mtime = Files.getLastModifiedTime(f)
      val fp1 = IndexLifecycle.dirFingerprint(dir)
      // same bytes, same mtime, different name — must miss
      val g = dir.resolve("part-0002.parquet")
      Files.move(f, g)
      Files.setLastModifiedTime(g, mtime)
      assert(IndexLifecycle.dirFingerprint(dir) != fp1)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("boundedCollectIds enforces the increment-class contract loudly") {
    import SparkTestSession._
    import org.apache.spark.sql.functions._
    val ids = spark.range(0, 100).select(col("id").as("doc_id"))
    // within budget: the full set, exactly
    assert(IndexLifecycle.boundedCollectIds(ids, "doc_id", maxIds = 100)
      .sorted.toSeq == (0L until 100L))
    // over budget: a loud error, not a driver OOM — and the limit is
    // in the plan, so at most maxIds+1 rows ever shipped
    val e = intercept[IllegalArgumentException](
      IndexLifecycle.boundedCollectIds(ids, "doc_id", maxIds = 99))
    assert(e.getMessage.contains("increment-class"))
  }

  test("boundedIdJoin picks its strategy from measured bytes, results invariant") {
    import SparkTestSession._
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") * 3).as("v"))
    val ids = spark.range(0, 1000, 7).select(col("id").as("k"))
    def nodes(d: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      d.count() // finalize AQE
      IndexLifecycle.executedPlanNodes(d)
    }
    val budget = spark.sessionState.conf.autoBroadcastJoinThreshold
    assert(budget > 0, "spec assumes the session default broadcast budget")
    // under budget: broadcast anti — the oracle-SF plan
    val under = IndexLifecycle.boundedIdJoin(df, ids, "k", budget, "left_anti")
    assert(nodes(under).exists(_.nodeName.contains("BroadcastHashJoin")))
    // over budget: SHUFFLE_HASH anti, never a broadcast of the id side
    val over = IndexLifecycle.boundedIdJoin(df, ids, "k", budget + 1, "left_anti")
    val on = nodes(over)
    assert(!on.exists(_.nodeName.contains("BroadcastHashJoin")))
    assert(on.exists(_.nodeName.contains("ShuffledHashJoin")))
    // identical results either way; semi flips the same switch
    assert(under.collect().map(_.getLong(0)).sorted.toSeq ==
      over.collect().map(_.getLong(0)).sorted.toSeq)
    val semiOver = IndexLifecycle.boundedIdJoin(df, ids, "k", budget + 1, "left_semi")
    assert(nodes(semiOver).exists(_.nodeName.contains("ShuffledHashJoin")))
    assert(semiOver.count() == ids.count())
    // far over budget: the §4.9 width policy widens the exchange
    // beyond the session default (64 MB budget per build task)
    val wide = IndexLifecycle.boundedIdJoin(df, ids, "k",
      4L << 30, "left_anti")
    val parts = wide.rdd.getNumPartitions
    assert(parts > spark.conf.get("spark.sql.shuffle.partitions").toInt,
      s"expected a widened exchange, saw $parts partitions")
  }
}
