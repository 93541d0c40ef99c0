package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, Similarity}

/** Recall-under-drift probe for the ANN index append policy: how much
  * search quality does a corpus lose by serving appends from the
  * FROZEN quantizer instead of rebuilding?
  *
  * [[AnnIndex.RebuildFraction]] (25%) bounds appended drift before a
  * scheduled rebuild; the spec proves appends are EXACT vs the same
  * frozen quantizer, but the policy question is recall vs the index a
  * REBUILD would produce (retrained quantizer over base+appended).
  * This probe measures it at the policy threshold: build over the
  * base corpus, append base×RebuildFraction more (the maximum drift
  * the policy admits), probe top-k; then rebuild fresh over the full
  * corpus with a retrained quantizer and probe again. Reported recall
  * = |result pairs ∩| / |fresh result pairs| for the same probes —
  * the number that makes the 25% threshold adjudicable rather than
  * asserted. Also reports both probes' exact-brute-force recall so
  * the drifted index's quality is judged against ground truth, not
  * just against the rebuilt index's own approximation. */
object AnnDriftProbe {

  private val ProbeN = 2000L
  private val K = 10

  def main(args: Array[String]): Unit = {
    val baseN = if (args.nonEmpty) args(0).trim.toLong else 1000000L
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

    val incN = (baseN * AnnIndex.RebuildFraction).toLong
    val fullN = baseN + incN
    // one staged universe: [0, baseN) base, [baseN, fullN) appended,
    // [fullN, fullN+ProbeN) probes — disjoint by construction
    val dir = s"$base/drift_n$baseN"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "_SUCCESS"))) {
      spark.range(0, fullN + ProbeN, 1, 32).map(i => ScaleGen.vecRow(i))
        .write.mode("overwrite").parquet(dir)
    }
    val all = spark.read.parquet(dir)
      .select(col("vec_id"), col("label"),
        Similarity.quantize(col("embedding")).as("qv"))
    val baseQ = all.filter(col("vec_id") < baseN)
    val incQ = all.filter(col("vec_id") >= baseN && col("vec_id") < fullN)
    val probes = all.filter(col("vec_id") >= fullN)
      .select(col("vec_id").as("probe_id"), col("qv").as("pqv"))

    // the training sample must SPAN its corpus (a strided slice), or
    // the "retrained" rebuild trains on the same base-prefix rows as
    // the frozen quantizer and the drift comparison is vacuous
    // (measured: id-prefix samples gave bit-identical quantizers and
    // recall_drifted_vs_fresh = 1.0000 exactly)
    def trainOn(corpus: org.apache.spark.sql.DataFrame, corpusN: Long,
                nCells: Int): Seq[(Long, Array[Long])] = {
      val stride = math.max(1L, corpusN / 262144L)
      val seeds = corpus.filter(col("vec_id") < nCells)
        .select(col("vec_id"), col("qv")).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
        .sortBy(_._1).toSeq
      AnnIndex.kmeansBulk(
        corpus.filter(pmod(col("vec_id"), lit(stride)) === 0)
          .select(col("qv")),
        seeds, iters = 2)
    }
    val nCells = math.max(64, math.round(math.sqrt(fullN.toDouble))).toInt

    // DRIFTED: quantizer frozen at base-corpus time, increment appended
    val drifted = java.nio.file.Files
      .createTempDirectory("graft_drift_a_").toString
    AnnIndex.buildAnnIndex(baseQ, trainOn(baseQ, baseN, nCells), drifted)
    AnnIndex.appendToAnnIndex(incQ, drifted)
    // FRESH: the rebuild the policy schedules — retrained on the full
    // corpus (same sample bound, corpus-spanning slice), everything in
    // base partitions
    val fresh = java.nio.file.Files
      .createTempDirectory("graft_drift_b_").toString
    AnnIndex.buildAnnIndex(baseQ.unionByName(incQ),
      trainOn(baseQ.unionByName(incQ), fullN, nCells), fresh)

    def results(idx: String, nProbe: Int): org.apache.spark.sql.DataFrame =
      AnnIndex.probeAnnIndex(spark, idx, probes, nProbe = nProbe, k = K)
        .select(col("probe_id"), col("candidate_id"))
    val a = results(drifted, 4).cache()
    val f = results(fresh, 4).cache()
    val nA = a.count(); val nF = f.count()
    val inter = a.join(f, Seq("probe_id", "candidate_id")).count()
    // ground truth: exact top-K by the same quantized dot over the
    // full corpus (bruteForceTopK quantizes its raw inputs itself)
    val raw = spark.read.parquet(dir)
    val truth = Similarity.bruteForceTopK(
        raw.filter(col("vec_id") >= fullN),
        raw.filter(col("vec_id") < fullN),
        "vec_id", "embedding", K)
      .select(col("probe_id"), col("candidate_id")).cache()
    val nT = truth.count()
    val aVsT = a.join(truth, Seq("probe_id", "candidate_id")).count()
    val fVsT = f.join(truth, Seq("probe_id", "candidate_id")).count()

    println(s"""{"base_vecs":$baseN,"appended_vecs":$incN,""" +
      s""""drift_fraction":${AnnIndex.RebuildFraction},""" +
      s""""n_cells":$nCells,"k":$K,"probes":$ProbeN,""" +
      f""""recall_drifted_vs_fresh":${inter.toDouble / nF}%.4f,""" +
      f""""recall_drifted_vs_exact":${aVsT.toDouble / nT}%.4f,""" +
      f""""recall_fresh_vs_exact":${fVsT.toDouble / nT}%.4f,""" +
      s""""rows":[$nA,$nF,$nT]}""")

    // the speed/recall KNOB, measured on the same fresh index: recall
    // vs exact and probe wall at each nProbe (candidate work and bytes
    // read scale ∝ nProbe; recall climbs toward exact)
    for (np <- Seq(4, 8, 16, 32)) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = results(fresh, np).cache()
      val n = r.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val hit = r.join(truth, Seq("probe_id", "candidate_id")).count()
      r.unpersist()
      println(s"""{"nprobe":$np,"n_cells":$nCells,""" +
        f""""recall_vs_exact":${hit.toDouble / nT}%.4f,""" +
        f""""probe_sec":$sec%.2f,"rows":$n}""")
    }
    spark.stop()
  }
}
