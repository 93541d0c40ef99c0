package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, Dedup, Similarity}

/** Ladder probe for the persisted ANN index (SCALING.md §4.17): fixed
  * probe batches against vector corpora of growing size, with the cell
  * count scaling as √N (the standard IVF sizing: cells and cell
  * populations grow together, so per-probe candidate work grows as
  * √N, not N).
  *
  * Measured per rung, ScaleBench discipline (cache cleared, min-of-2):
  *  - build_sec: kmeansBulk train (2 iters) + assignment + partitioned
  *    write — one-time corpus event, cached on disk across runs;
  *  - probe10_sec: a 10-probe batch — the partition-PRUNED path (reads
  *    ~nProbe of nCells directories; should stay near-flat);
  *  - probe10k_sec: a 10k-probe batch — hits every cell, so the scan
  *    is corpus-sized but candidate scoring is bounded by
  *    probes × nProbe × N/nCells ∝ √N per probe (sublinear per
  *    doubling: ~1.41× plus scan growth);
  *  - append_sec: a 10k-vector append against the frozen quantizer
  *    (must be increment-sized, flat across rungs), rolled back after
  *    timing so the cached index stays pristine.
  *
  * Probe/append ids start at sizes.max (disjoint from every corpus at
  * every rung — the IndexProbe id-reuse lesson, round-9 ADVICE). */
object AnnIndexProbe {

  private[graft] val ProbeBig = 10000L
  private[graft] val AppendVecs = 10000L

  /** Training-sample size for the `sample` variant: the corpus-
    * independent quantizer-training bound every production IVF uses
    * (FAISS trains on ~10⁵–10⁶ points regardless of corpus size) —
    * turns the build's 2-Lloyd-pass N·√N training term into a
    * constant, leaving only the unavoidable single assignment pass. */
  private val TrainSample = 262144L

  def main(args: Array[String]): Unit = {
    val sizes = (if (args.nonEmpty) args(0) else "1000000,2000000,4000000")
      .split(",").map(_.trim.toLong).toSeq
    val sampleTrain = args.length > 1 && args(1) == "sample"
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
    // fixed probe + append increments, staged once, keyed on base id
    val incDir = s"$base/vecinc_from$maxN"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(incDir, "_SUCCESS"))) {
      spark.range(maxN, maxN + ProbeBig + AppendVecs, 1, 8)
        .map(i => ScaleGen.vecRow(i))
        .write.mode("overwrite").parquet(incDir)
    }
    val incQ = spark.read.parquet(incDir)
      .select(col("vec_id"), col("label"),
        Similarity.quantize(col("embedding")).as("qv"))
    val probes10k = incQ.filter(col("vec_id") < maxN + ProbeBig)
      .select(col("vec_id").as("probe_id"), col("qv").as("pqv"))
    val probes10 = probes10k.filter(col("probe_id") < maxN + 10)
    val appendQ = incQ.filter(col("vec_id") >= maxN + ProbeBig)

    for (n <- sizes) {
      val vecDir = s"$base/vecs_n$n"
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(vecDir, "_SUCCESS"))) {
        val parts = math.max(8, math.min(64, (n / 50000).toInt))
        spark.range(0, n, 1, parts).map(i => ScaleGen.vecRow(i))
          .write.mode("overwrite").parquet(vecDir)
      }
      val vecsQ = spark.read.parquet(vecDir)
        .select(col("vec_id"), col("label"),
          Similarity.quantize(col("embedding")).as("qv"))

      val nCells = math.max(64, math.round(math.sqrt(n.toDouble))).toInt
      val idxDir = if (sampleTrain) s"$base/annidx_s_n$n" else s"$base/annidx_n$n"
      val metaPath = java.nio.file.Paths.get(idxDir, "_INDEX_META")
      val buildSec =
        if (java.nio.file.Files.isRegularFile(metaPath)) Double.NaN
        else {
          val t0 = System.nanoTime()
          val seeds = vecsQ.filter(col("vec_id") < nCells)
            .select(col("vec_id"), col("qv")).collect()
            .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
            .sortBy(_._1).toSeq
          // sample variant: train the quantizer on a bounded
          // deterministic slice (ids are hash-mixed uniform across the
          // fixture clusters, so the prefix is an unbiased sample);
          // full variant: Lloyd over the whole corpus
          val trainSet =
            if (sampleTrain) vecsQ.filter(col("vec_id") < TrainSample)
            else vecsQ
          val cents = AnnIndex.kmeansBulk(trainSet.select(col("qv")), seeds,
            iters = 2)
          AnnIndex.buildAnnIndex(vecsQ, cents, idxDir)
          (System.nanoTime() - t0) / 1e9
        }
      val meta = AnnIndex.readMeta(idxDir)

      def probePass(p: org.apache.spark.sql.DataFrame): (Double, Long) = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val df = AnnIndex.probeAnnIndex(spark, idxDir, p, nProbe = 4, k = 10)
        df.write.format("noop").mode("overwrite").save()
        ((System.nanoTime() - t0) / 1e9, df.count())
      }
      val (s10a, _) = probePass(probes10)
      val (s10b, rows10) = probePass(probes10)
      val (sBig1, _) = probePass(probes10k)
      val (sBig2, rowsBig) = probePass(probes10k)

      // append cost (delta write), then roll the index back (harness
      // trick — the cached rung must stay pristine for later runs)
      def listIdx(): Set[String] =
        scala.util.Using.resource(
          java.nio.file.Files.walk(java.nio.file.Paths.get(idxDir)))(s =>
          scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
            .asScala.filter(java.nio.file.Files.isRegularFile(_))
            .map(_.toString).toSet)
      val before = listIdx()
      val metaBytes = java.nio.file.Files.readAllBytes(metaPath)
      // the append commits the layout manifest too: snapshot it for
      // the rollback (a restored meta with a post-append manifest
      // would point probes at deleted delta files)
      val manPath = java.nio.file.Paths.get(idxDir,
        graft.operators.IndexLifecycle.ManifestName)
      val manBytes =
        if (java.nio.file.Files.isRegularFile(manPath))
          Some(java.nio.file.Files.readAllBytes(manPath))
        else None
      val ta = System.nanoTime()
      AnnIndex.appendToAnnIndex(appendQ, idxDir)
      val appendSec = (System.nanoTime() - ta) / 1e9
      // post-append probe: the delta union must not change the probe
      // class (delta is increment-sized; same cell predicate)
      val (pd1, _) = probePass(probes10)
      (listIdx() -- before).foreach(f =>
        java.nio.file.Files.delete(java.nio.file.Paths.get(f)))
      java.nio.file.Files.write(metaPath, metaBytes)
      manBytes match {
        case Some(b) => java.nio.file.Files.write(manPath, b)
        case None => java.nio.file.Files.deleteIfExists(manPath)
      }

      def j(v: Double) = if (v.isNaN) "null" else f"$v%.2f"
      println(s"""{"corpus_vecs":$n,"n_cells":$nCells,""" +
        s""""train":"${if (sampleTrain) "sample262k" else "full"}",""" +
        s""""build_sec":${j(buildSec)},""" +
        s""""probe10_sec":${j(math.min(s10a, s10b))},""" +
        s""""probe10k_sec":${j(math.min(sBig1, sBig2))},""" +
        s""""probe10_passes":[${j(s10a)},${j(s10b)}],""" +
        s""""probe10k_passes":[${j(sBig1)},${j(sBig2)}],""" +
        s""""rows10":$rows10,"rows10k":$rowsBig,""" +
        s""""append_sec":${j(appendSec)},""" +
        s""""probe10_postappend_sec":${j(pd1)},""" +
        s""""index_vecs":${meta.nVecs}}""")
      Dedup.purgeScratchDirs()
    }
    spark.stop()
  }
}
