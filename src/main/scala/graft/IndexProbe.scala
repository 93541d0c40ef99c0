package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SignatureIndex}

import scala.jdk.CollectionConverters._

/** Ladder probe for the persisted signature index (SCALING.md §4.13):
  * a FIXED 100k-doc increment probed against corpora of growing size.
  * The round-8 weak item was that each incremental-dedup call paid a
  * corpus-sized re-hash/re-stage; with the persisted index the
  * per-increment cost must be ~flat across corpus doublings — the
  * increment hashing dominates and the corpus contributes only a
  * semi-pruned columnar scan of its signature table.
  *
  * Per corpus size: the index is built once (timed, then cached on
  * disk across runs — rebuild only when absent, mirroring production
  * where a build is a corpus event, not a probe cost) and the probe
  * runs min-of-2 with the spark cache cleared, exactly the ScaleBench
  * measurement discipline. The increment is ids [corpusN, corpusN +
  * 100k) of the same deterministic ScaleGen universe — disjoint from
  * every corpus, identical bytes at every rung.
  */
object IndexProbe {

  private val IncrementDocs = 100000L

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("pairs")) {
      pairsMode((if (args.length > 1) args(1) else "1000000,2000000")
        .split(",").map(_.trim.toLong).toSeq)
      return
    }
    val sizes = (if (args.nonEmpty) args(0) else "1000000,2000000,4000000")
      .split(",").map(_.trim.toLong).toSeq
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

    // the one fixed increment, staged once as parquet so every rung
    // reads identical bytes (and the probe's own increment staging is
    // measured, not the docRow generation). The staged dir is KEYED ON
    // THE BASE ID (sizes.max): a later run with a larger corpus must
    // not reuse an increment whose ids fall INSIDE its corpus —
    // ScaleGen.docRow is deterministic by id, so such a reuse would
    // plant 100k byte-identical corpus duplicates and contaminate the
    // probe (round-9 ADVICE).
    val maxN = sizes.max
    val incDir = s"$base/inc100k_from$maxN"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(incDir, "_SUCCESS"))) {
      spark.range(maxN, maxN + IncrementDocs, 1, 8)
        .map(i => ScaleGen.docRow(i))
        .write.mode("overwrite").parquet(incDir)
    }

    for (n <- sizes) {
      val dir = s"$base/n$n"
      ScaleGen.ensure(spark, dir, nDocs = n, nVecs = n / 2, nEvents = n * 2)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val hashed = Dedup.shingleHashSets(docs, "doc_id", "text", 5)
      val idxDir = s"$base/sigidx_n$n"
      val metaPath = java.nio.file.Paths.get(idxDir, "_INDEX_META")
      val buildSec =
        if (java.nio.file.Files.isRegularFile(metaPath)) Double.NaN
        else {
          val t0 = System.nanoTime()
          SignatureIndex.buildSignatureIndex(hashed, idxDir)
          (System.nanoTime() - t0) / 1e9
        }
      val meta = SignatureIndex.readMeta(idxDir)

      val incHashed = Dedup.shingleHashSets(
        spark.read.parquet(incDir), "doc_id", "text", 5)
      def probePass(): (Double, Long) = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val df = SignatureIndex.probeSignatureIndex(incHashed, idxDir)
        df.write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, df.count())
      }
      val (s1, _) = probePass()
      val (s2, rows) = probePass()

      // append-lifecycle cost (the increment-sized claim): time
      // appendToIndex of the same increment, then ROLL THE INDEX BACK
      // (delete the appended part files, restore the meta bytes) so
      // the on-disk index cache stays pristine for future rungs/runs —
      // a measurement harness trick, not an engine operation
      val sigDir = java.nio.file.Paths.get(idxDir, "sig")
      def listSig(): Set[String] =
        scala.util.Using.resource(java.nio.file.Files.list(sigDir))(
          _.iterator().asScala.map(_.getFileName.toString).toSet)
      val sigBefore = listSig()
      val metaBytes = java.nio.file.Files.readAllBytes(metaPath)
      val ta = System.nanoTime()
      SignatureIndex.appendToIndex(incHashed, idxDir)
      val appendSec = (System.nanoTime() - ta) / 1e9
      (listSig() -- sigBefore).foreach(f =>
        java.nio.file.Files.delete(sigDir.resolve(f)))
      java.nio.file.Files.write(metaPath, metaBytes)

      def j(v: Double) = if (v.isNaN) "null" else f"$v%.2f"
      println(s"""{"corpus_docs":$n,"increment_docs":$IncrementDocs,""" +
        s""""build_sec":${j(buildSec)},"probe_sec":${j(math.min(s1, s2))},""" +
        s""""probe_passes":[${j(s1)},${j(s2)}],"pairs":$rows,""" +
        s""""append_sec":${j(appendSec)},""" +
        s""""index_sig_bytes":${meta.sigBytes}}""")
      Dedup.purgeScratchDirs() // increment stagings are dead past here
    }
    spark.stop()
  }

  /** `pairs` mode (round 12): the measurement that DECIDED the
    * staged-pair append policy. An incremental-maintenance path
    * (append extends pairs/ with cross(inc, live) ∪ self(inc)) was
    * implemented and priced here against the restage it would
    * replace — and LOST at every rung (1M: 18.8 vs 8.8 s warm; 2M:
    * 62.8 vs 42.9 s): the restage rides the PERSISTED signatures
    * with zero re-hashing, while the increment path pays the
    * across-probe's corpus scan plus increment hashing. The path was
    * reverted (SCALING.md §4.23); appends invalidate and the next
    * clustering lazily restages. With the reverted code this mode
    * prices that lifecycle: restage_sec (cold stage),
    * append_maint_sec (append + invalidation — increment-sized),
    * restage_after_append_sec (the lazy restage a later clustering
    * pays), staged_rows/restaged_rows (post-append equality check of
    * the served graph vs a fresh restage, both on the same index). */
  private def pairsMode(sizes: Seq[Long]): Unit = {
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

    val maxN = sizes.max
    val incDir = s"$base/inc100k_from$maxN"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(incDir, "_SUCCESS"))) {
      spark.range(maxN, maxN + IncrementDocs, 1, 8)
        .map(i => ScaleGen.docRow(i))
        .write.mode("overwrite").parquet(incDir)
    }
    for (n <- sizes) {
      val dir = s"$base/n$n"
      // canonical fixture counts — a stub-count stamp would thrash the
      // SHARED $base/n$n dir every ScaleBench/CcProbe alternation
      // (third-pass finding)
      ScaleGen.ensure(spark, dir, nDocs = n, nVecs = n / 2, nEvents = n * 2)
      val hashed = Dedup.shingleHashSets(
        spark.read.parquet(s"$dir/documents.parquet"),
        "doc_id", "text", 5)
      val idxDir = s"$base/sigidx_n$n"
      if (!java.nio.file.Files.isRegularFile(
          java.nio.file.Paths.get(idxDir, "_INDEX_META")))
        SignatureIndex.buildSignatureIndex(hashed, idxDir)
      val scratch = s"$base/pairs_probe_idx_n$n"
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(scratch))
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(idxDir), new java.io.File(scratch))
      // the cached rung may carry a pairs/ graph staged by CcProbe —
      // the t0 stage below must be genuinely COLD (third-pass finding)
      org.apache.commons.io.FileUtils.deleteDirectory(
        java.nio.file.Paths.get(scratch, "pairs").toFile)
      try {
        val t0 = System.nanoTime()
        SignatureIndex.ensureSelfPairs(spark, scratch)
        val restageSec = (System.nanoTime() - t0) / 1e9
        val incHashed = Dedup.shingleHashSets(
          spark.read.parquet(incDir), "doc_id", "text", 5)
        val t1 = System.nanoTime()
        SignatureIndex.appendToIndex(incHashed, scratch)
        val maintSec = (System.nanoTime() - t1) / 1e9
        // the FIRST post-append restage IS the lazy cost a later
        // clustering pays — time it directly (the old second-restage
        // measured a cache-warmed repeat and its row compare was
        // restage-vs-restage, vacuous — third-pass finding)
        val t2 = System.nanoTime()
        val restagedRows = SignatureIndex.ensureSelfPairs(spark, scratch).count()
        val restage2Sec = (System.nanoTime() - t2) / 1e9
        println(s"""{"corpus_docs":$n,"probe":"pairs_maint",""" +
          s""""increment_docs":$IncrementDocs,""" +
          f""""restage_sec":$restageSec%.2f,""" +
          f""""append_invalidate_sec":$maintSec%.2f,""" +
          f""""restage_after_append_sec":$restage2Sec%.2f,""" +
          s""""restaged_rows":$restagedRows}""")
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(scratch))
        Dedup.purgeScratchDirs()
      }
    }
    spark.stop()
  }
}
