package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, Dedup, IndexLifecycle, SignatureIndex, Similarity}
import graft.queries.DataPipelineQueries

/** Dev diagnostic (round-13 optimization): decompose the four streaming
  * mutation-loop oracles into their timed components — pristine-copy
  * setup, per-trigger mutation (delete/gate+append), maintenance
  * consult, inter-trigger probe — so optimization effort lands on the
  * component that actually costs, not on bench-level noise. Each
  * component runs OUTSIDE the streaming machinery (the foreachBatch
  * floor is priced separately by StreamFloor/EmbedGateFloor).
  *
  * Usage: scripts/run_main.sh graft.MutLoopProbe [sfDir] [passes]
  */
object MutLoopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 3
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
    val s = spark
    val d = sfDir

    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mutprobe]   $what%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    for (p <- 1 to passes) {
      println(s"[mutprobe] ===== pass $p (sig takedown shape) =====")
      val bucket = pmod(graft.functions.HashFunctions.hash32(
        col("doc_id").cast("string")), lit(100))
      def hashedAll = Dedup.shingleHashSets(
        graft.Tables.documents(s, d).repartition(col("doc_id")),
        "doc_id", "text", DataPipelineQueries.SHINGLE_K)
      val base = DataPipelineQueries.docs90Index(s, d)
      // the canonical copy/run/reclaim bracket (hand-rolling it was
      // itself a prior review finding); the copy is timed inside
      var tCopy = System.nanoTime()
      IndexLifecycle.withMutableCopy(base) { idx =>
        println(f"[mutprobe]   ${"freshMutableCopy(sig)"}%-34s ${(System.nanoTime() - tCopy) / 1e9}%6.2f s")
        val inc = hashedAll.withColumn("bucket", bucket)
          .filter(col("bucket") >= 90).drop("bucket")
        val (incDir, incBytes) = t("stageIncrement")(
          SignatureIndex.stageIncrement(inc))
        for (b <- 0 until 3) {
          val ids = graft.Tables.documents(s, d).filter(
              bucket < 90 && col("doc_id") % 5 === 0 &&
              pmod(col("doc_id"), lit(3)) === b)
            .select(col("doc_id"))
          t(s"deleteFromIndex b$b")(SignatureIndex.deleteFromIndex(ids, idx))
          // the SAME rehash frame sigTakedownLoop passes (hashedAll
          // semi-joined to the live sig doc_ids) — the unfiltered
          // corpus would time a different plan, and a drift-fired
          // rebuild would rebuild over the wrong corpus (review
          // finding)
          t(s"maintainIndex consult b$b")(
            SignatureIndex.maintainIndex(s, idx)(
              hashedAll.join(
                s.read.parquet(s"$idx/sig").select(col("doc_id")).distinct(),
                Seq("doc_id"), "left_semi")))
          t(s"probeStagedIncrement b$b")(
            SignatureIndex.probeStagedIncrement(s, incDir, incBytes, idx)
              .write.format("noop").mode("overwrite").save())
        }
      }

      println(s"[mutprobe] ===== pass $p (ann takedown shape) =====")
      val abase = AnnIndex.ensureAnnIndex(
        SignatureIndex.sourceCacheKey("annivf_takedown_p", d,
          "embeddings.parquet"),
        stamp = s"cents=16 iters=2 pristine") { pth =>
        AnnIndex.buildAnnIndex(
          graft.Tables.embeddings(s, d).select(col("vec_id"), col("label"),
            Similarity.quantize(col("embedding")).as("qv")),
          DataPipelineQueries.trainedIvfCentroids(s, d), pth)
      }
      tCopy = System.nanoTime()
      IndexLifecycle.withMutableCopy(abase) { aidx =>
        println(f"[mutprobe]   ${"freshMutableCopy(ann)"}%-34s ${(System.nanoTime() - tCopy) / 1e9}%6.2f s")
        // the ORACLE's delete batches: the last-tenth increment slice in
        // vec_id-contiguous thirds (cumulative ~10% drift — no rebuild)
        val idMax = DataPipelineQueries.embeddingsMaxVecId(s, d)
        val idMin = (idMax + 1) * 9 / 10
        val span = math.max(idMax - idMin, 1L)
        for (b <- 0 until 3) {
          val lo = idMin + span * b / 3
          val hi = if (b == 2) idMax + 1 else idMin + span * (b + 1) / 3
          val ids = graft.Tables.embeddings(s, d)
            .filter(col("vec_id") >= lo && col("vec_id") < hi)
            .select(col("vec_id"))
          t(s"deleteFromAnnIndex b$b")(AnnIndex.deleteFromAnnIndex(ids, aidx))
          t(s"maintainAnnIndex consult b$b")(AnnIndex.maintainAnnIndex(s, aidx))
          t(s"probeAnnIndex b$b")(
            AnnIndex.probeAnnIndex(s, aidx,
              DataPipelineQueries.annProbes(s, d), nProbe = 4, k = 3)
              .write.format("noop").mode("overwrite").save())
        }
      }
    }
    spark.stop()
  }
}
