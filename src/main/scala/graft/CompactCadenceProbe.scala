package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, Similarity}

/** Compaction CADENCE probe (SCALING.md §4.19): `compactCells` exists
  * and is result-invariant, but nothing said WHEN to run it. This
  * measures the thing the trigger should bound — probe degradation as
  * un-compacted delta accumulates: probe10 against the 8M ladder index
  * after k ∈ {0, 1, 5, 20} appends of 10k vectors each, with the delta
  * part-file count and bytes at each rung, then after one compaction.
  *
  * Runs against a scratch COPY of the cached ladder index (appends +
  * compaction rewrite the layout; the cached rung must stay pristine
  * for later sessions), deleted on exit.
  *
  * The derived policy lands as [[AnnIndex.needsCompaction]]: the delta
  * is the LSM side table probes scan IN FULL (its cell predicate is a
  * PushedFilter, not a partition prune), so the trigger is delta
  * part-file count — each append adds files whose per-file open cost,
  * not bytes, is what degrades the pruned probe path. */
object CompactCadenceProbe {

  private val IdBase = 1L << 41
  private val AppendVecs = 10000L

  /** `delete` mode (round 11): prices the DELETE lifecycle at the 8M
    * rung — tombstone-write cost (must be increment-sized), the
    * post-delete probe (pays one broadcast anti-join), and the
    * compaction that applies the tombstones physically. Two delete
    * shapes: 100 ids (touches ≤100 cells — the takedown case; the
    * application rewrites only those) and 10k ids (uniform ids touch
    * ~every cell — the application is corpus-write-priced, the honest
    * worst case the affected-cells bound permits). */
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("delete")) {
      deleteLadder(if (args.length > 1) args(1).toLong else 8000000L)
      return
    }
    if (args.headOption.contains("drift")) {
      driftRung(if (args.length > 1) args(1).toLong else 8000000L)
      return
    }
    val n = if (args.nonEmpty) args(0).toLong else 8000000L
    val checkpoints = (if (args.length > 1) args(1) else "1,5,20")
      .split(",").map(_.trim.toInt).toSeq
    val base = sys.env.getOrElse("GRAFT_SCALE_BASE", "target/scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val srcIdx = s"$base/annidx_s_n$n"
    require(Files.isRegularFile(Paths.get(srcIdx, "_INDEX_META")),
      s"ladder index missing at $srcIdx — run AnnIndexProbe first")
    val idx = s"$base/compact_probe_idx_n$n"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idx))
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(srcIdx), new java.io.File(idx))

    try {
      // fixed probe batch, disjoint ids (the AnnIndexProbe discipline)
      val probes10 = spark.range(IdBase, IdBase + 10, 1, 1)
        .map(i => ScaleGen.vecRow(i))
        .select(col("vec_id").as("probe_id"),
          Similarity.quantize(col("embedding")).as("pqv"))
        .localCheckpoint(true)

      def deltaState(): (Int, Long) = {
        val d = Paths.get(idx, "delta")
        if (!Files.isDirectory(d)) (0, 0L)
        else {
          val files = scala.util.Using.resource(Files.list(d))(s =>
            scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
              .asScala
              .filter(_.getFileName.toString.endsWith(".parquet")).toSeq)
          (files.size, files.map(Files.size).sum)
        }
      }

      def probe10(): Double = {
        val passes = (1 to 2).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          AnnIndex.probeAnnIndex(spark, idx, probes10, nProbe = 4, k = 10)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        passes.min
      }

      def report(stage: String, appends: Int): Unit = {
        val (df, db) = deltaState()
        val p = probe10()
        println(s"""{"corpus_vecs":$n,"stage":"$stage","appends":$appends,""" +
          s""""delta_files":$df,"delta_bytes":$db,""" +
          f""""probe10_sec":$p%.2f,""" +
          s""""needs_compaction":${AnnIndex.needsCompaction(idx)}}""")
      }

      report("fresh", 0)
      var done = 0
      for (k <- checkpoints) {
        while (done < k) {
          val lo = IdBase + 1000000L + AppendVecs * done
          val inc = spark.range(lo, lo + AppendVecs, 1, 4)
            .map(i => ScaleGen.vecRow(i))
            .select(col("vec_id"), col("label"),
              Similarity.quantize(col("embedding")).as("qv"))
          AnnIndex.appendToAnnIndex(inc, idx)
          done += 1
        }
        report("appended", done)
      }
      val t0 = System.nanoTime()
      val compacted = AnnIndex.compactCells(spark, idx)
      val cSec = (System.nanoTime() - t0) / 1e9
      println(s"""{"corpus_vecs":$n,"stage":"compacted",""" +
        s""""cells_rewritten":$compacted,""" + f""""compact_sec":$cSec%.2f}""")
      report("post_compact", done)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idx))
    }
    spark.stop()
  }

  /** `drift` mode (round 12): the WORST LEGAL TOMBSTONE STATE — a
    * cumulative delete set at exactly the 25% drift bound (2M ids on
    * the 8M rung), the state the round-11 verdict named as the
    * broadcast scale-killer. Prices: the chunked delete calls (8 ×
    * 250k, production increments), the tombstoned probe10 — which
    * must PLAN the anti-join as SHUFFLE_HASH, not broadcast (the
    * byte-bounded policy; the flag is printed from the executed plan)
    * — and the bulk physical application + the post-compact probe. */
  private def driftRung(n: Long): Unit = {
    val base = sys.env.getOrElse("GRAFT_SCALE_BASE", "target/scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val srcIdx = s"$base/annidx_s_n$n"
    require(Files.isRegularFile(Paths.get(srcIdx, "_INDEX_META")),
      s"ladder index missing at $srcIdx — run AnnIndexProbe first")
    val idx = s"$base/drift_probe_idx_n$n"
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idx))
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(srcIdx), new java.io.File(idx))
    try {
      val probes10 = spark.range(IdBase, IdBase + 10, 1, 1)
        .map(i => ScaleGen.vecRow(i))
        .select(col("vec_id").as("probe_id"),
          Similarity.quantize(col("embedding")).as("pqv"))
        .localCheckpoint(true)
      def probe10(): (Double, org.apache.spark.sql.DataFrame) = {
        var last: org.apache.spark.sql.DataFrame = null
        val t = (1 to 2).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          last = AnnIndex.probeAnnIndex(spark, idx, probes10, nProbe = 4, k = 10)
          last.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.min
        (t, last)
      }
      val (pre, _) = probe10()
      // 25% of the corpus, strided across the cell space, delivered as
      // 8 production-sized increments
      val nDel = n / 4
      val chunk = nDel / 8
      val t0 = System.nanoTime()
      for (c <- 0L until 8L) {
        val ids = spark.range(c * 4, n, 32, 8).toDF("vec_id")
          .limit(chunk.toInt)
        AnnIndex.deleteFromAnnIndex(ids, idx)
      }
      val delSec = (System.nanoTime() - t0) / 1e9
      val tombBytes = graft.operators.IndexLifecycle.parquetBytes(
        Paths.get(idx, "tombstones"))
      val (post, dfPost) = probe10()
      val (bAnti, sAnti) = graft.operators.IndexLifecycle.antiJoinKinds(dfPost)
      val t1 = System.nanoTime()
      val rewritten = AnnIndex.compactCells(spark, idx)
      val compSec = (System.nanoTime() - t1) / 1e9
      val (postComp, dfComp) = probe10()
      val (bAnti2, sAnti2) = graft.operators.IndexLifecycle.antiJoinKinds(dfComp)
      println(s"""{"corpus_vecs":$n,"probe":"drift_rung",""" +
        s""""n_deleted":${AnnIndex.readMeta(idx).deletedVecs},""" +
        s""""tombstone_bytes":$tombBytes,""" +
        f""""delete_sec":$delSec%.2f,"probe10_pre_sec":$pre%.2f,""" +
        f""""probe10_tombstoned_sec":$post%.2f,""" +
        s""""anti_broadcast":$bAnti,"anti_shuffled":$sAnti,""" +
        s""""cells_rewritten":$rewritten,""" +
        f""""compact_sec":$compSec%.2f,""" +
        f""""probe10_post_compact_sec":$postComp%.2f,""" +
        s""""anti_after_compact":${bAnti2 || sAnti2}}""")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idx))
    }
    spark.stop()
  }

  private def deleteLadder(n: Long): Unit = {
    val base = sys.env.getOrElse("GRAFT_SCALE_BASE", "target/scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val srcIdx = s"$base/annidx_s_n$n"
    require(java.nio.file.Files.isRegularFile(
      java.nio.file.Paths.get(srcIdx, "_INDEX_META")),
      s"ladder index missing at $srcIdx — run AnnIndexProbe first")
    val probes10 = spark.range(IdBase, IdBase + 10, 1, 1)
      .map(i => ScaleGen.vecRow(i))
      .select(col("vec_id").as("probe_id"),
        Similarity.quantize(col("embedding")).as("pqv"))
      .localCheckpoint(true)

    for (nDel <- Seq(100L, 10000L)) {
      val idx = s"$base/delete_probe_idx_n$n"
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idx))
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(srcIdx), new java.io.File(idx))
      try {
        def probe10(): Double =
          (1 to 2).map { _ =>
            spark.catalog.clearCache()
            val t0 = System.nanoTime()
            AnnIndex.probeAnnIndex(spark, idx, probes10, nProbe = 4, k = 10)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }.min
        val pre = probe10()
        // existing ids, strided across the id (and thus cell) space
        val ids = spark.range(0, n, n / nDel, 4).toDF("vec_id")
        val t0 = System.nanoTime()
        AnnIndex.deleteFromAnnIndex(ids, idx)
        val delSec = (System.nanoTime() - t0) / 1e9
        val post = probe10()
        val t1 = System.nanoTime()
        val rewritten = AnnIndex.compactCells(spark, idx)
        val compSec = (System.nanoTime() - t1) / 1e9
        val postComp = probe10()
        println(s"""{"corpus_vecs":$n,"probe":"delete_ladder",""" +
          s""""n_deleted":$nDel,""" +
          f""""delete_sec":$delSec%.2f,"probe10_pre_sec":$pre%.2f,""" +
          f""""probe10_tombstoned_sec":$post%.2f,""" +
          s""""cells_rewritten":$rewritten,""" +
          f""""compact_sec":$compSec%.2f,""" +
          f""""probe10_post_compact_sec":$postComp%.2f}""")
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idx))
      }
    }
    spark.stop()
  }
}
