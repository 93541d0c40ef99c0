package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Decomposition probe for the dedup_clusters ladder rung (round-9
  * item: at 4M docs the query cost 308.6 s, 3.3× the 2M rung while
  * edges grew 2.94× — which stage carries it?). The query is two
  * stages with a natural cut: STRONG-EDGE PRODUCTION (the one-pass LSH
  * band join + Jaccard ≥ 0.5 filter) feeding CONNECTED COMPONENTS
  * (driver union-find under 100k edges, else iterative label
  * propagation). Each stage is timed separately on the same corpus —
  * edges to a noop sink (production cost alone), then edges
  * re-produced into cache and CC run off the cache (CC cost alone,
  * the exact shape ccRounds runs in dedup_clusters since it caches
  * its edge input first). Calibration brackets per ScaleBench's
  * discipline: min-of-2, discard-and-retry on contended windows.
  */
object CcProbe {

  def main(args: Array[String]): Unit = {
    val sizes = (if (args.nonEmpty) args(0) else "2000000,4000000")
      .split(",").map(_.trim.toLong).toSeq
    // "indexonly": skip the live edge/CC decomposition and measure only
    // the staged-pairs path (the §4.14 recurring-cost claim) — the big
    // rungs re-measure the production shape without re-paying the live
    // band join twice
    val indexOnly = args.length > 1 && args(1) == "indexonly"
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

    for (n <- sizes) {
      val dir = s"$base/n$n"
      ScaleGen.ensure(spark, dir, nDocs = n, nVecs = n / 2, nEvents = n * 2)
      def hashed = Dedup.shingleHashSets(
        spark.read.parquet(s"$dir/documents.parquet").repartition(col("doc_id")),
        "doc_id", "text", 5)
      def strong = Dedup.lshJaccardPairs(hashed, 4)
        .filter(col("jaccard_bp") >= 5000)
        .select(col("id_a"), col("id_b"))

      if (!indexOnly) {
      def timed(f: => Unit): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val calPre = Bench.calibrationMs()
      // stage 1: edge production alone (noop sink — nothing retained)
      val tEdges = math.min(
        timed(strong.write.format("noop").mode("overwrite").save()),
        timed(strong.write.format("noop").mode("overwrite").save()))
      // stage 2: CC alone — edges materialized into cache FIRST (timed
      // separately as the handoff cost), then CC off the warm cache
      spark.catalog.clearCache()
      val sc = strong.cache()
      val tCacheFill = { val t0 = System.nanoTime(); sc.count()
        (System.nanoTime() - t0) / 1e9 }
      val nEdges = sc.count()
      val verts = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"))
      val tCc = { val t0 = System.nanoTime()
        Dedup.connectedComponents(verts, "doc_id", sc)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9 }
      val calPost = Bench.calibrationMs()
      sc.unpersist()
      println(f"""{"n_docs":$n,"edges":$nEdges,"edges_sec":$tEdges%.1f,""" +
        f""""cache_fill_sec":$tCacheFill%.1f,"cc_sec":$tCc%.1f,""" +
        f""""cc_rounds":${Dedup.lastCcRounds},""" +
        f""""cal_ms":[$calPre%.0f,$calPost%.0f]}""")
      Dedup.purgeScratchDirs() // each pass staged ~bytes(corpus) of scratch
      }

      // the §4.14 fix measured: one-time pair-graph staging beside the
      // persisted index, then clustering as a pairs scan + flat CC —
      // the recurring cost a production pipeline actually pays
      import graft.operators.SignatureIndex
      val idxDir = s"$base/sigidx_n$n"
      if (!java.nio.file.Files.isRegularFile(
          java.nio.file.Paths.get(idxDir, "_INDEX_META")))
        SignatureIndex.buildSignatureIndex(hashed, idxDir)
      val tPairsStage = { val t0 = System.nanoTime()
        SignatureIndex.ensureSelfPairs(spark, idxDir).count()
        (System.nanoTime() - t0) / 1e9 }
      def clusterPass(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SignatureIndex.clustersFromIndex(spark, idxDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val tIdxClusters = math.min(clusterPass(), clusterPass())
      println(f"""{"n_docs":$n,"pairs_stage_once_sec":$tPairsStage%.1f,""" +
        f""""clusters_from_index_sec":$tIdxClusters%.1f,""" +
        f""""cc_rounds":${Dedup.lastCcRounds}}""")
      Dedup.purgeScratchDirs()
    }
    spark.stop()
  }
}
