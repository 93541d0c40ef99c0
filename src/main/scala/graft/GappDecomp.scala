package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AnnIndex, Dedup, IndexLifecycle, SignatureIndex, Similarity}
import graft.queries.DataPipelineQueries
import graft.streaming.StreamingOps

/** Dev diagnostic (round-14 optimization): decompose the two
  * gate→APPEND mutation loops (stream_gate_append /
  * stream_embed_gate_append) into their per-trigger sub-steps — the
  * sidecar read, the gate decision (checkpoint), the emptiness check,
  * the sidecar write, the index append, the maintenance consult —
  * with WALL time and SCHEDULED-JOB count per step, so the round's
  * "fold the sidecar write / merge the gate prunes" candidates land
  * on the step that actually costs (guide §1.1: decide where the time
  * goes before changing anything).
  *
  * The trigger batches replicate the oracle staging exactly
  * (documents/embeddings stream slices + the trailing replay batch),
  * run OUTSIDE the streaming machinery — the foreachBatch floor is
  * StreamFloor's subject.
  *
  * Usage: scripts/run_main.sh graft.GappDecomp [sfDir] [passes]
  */
object GappDecomp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 2
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

    val jobs = new AtomicInteger(0)
    val verbose = sys.env.contains("GRAFT_GAPP_VERBOSE")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val names = j.stageInfos.map(_.name.takeWhile(_ != '\n').take(70))
            .mkString(" | ")
          println(s"[gapp-job] ${j.jobId} stages=${j.stageInfos.size} $names")
        }
      }
    })
    def t[A](what: String)(f: => A): A = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[gapp]   $what%-36s $dt%6.3f s  jobs=${jobs.get() - j0}")
      r
    }

    for (p <- 1 to passes) {
      println(s"[gapp] ===== pass $p (sig gate-append shape) =====")
      val bucket = pmod(graft.functions.HashFunctions.hash32(
        col("doc_id").cast("string")), lit(100))
      def hashedAll = Dedup.shingleHashSets(
        graft.Tables.documents(s, d).repartition(col("doc_id")),
        "doc_id", "text", DataPipelineQueries.SHINGLE_K)
      val base = SignatureIndex.ensureIndex(
        hashedAll.withColumn("bucket", bucket)
          .filter(col("bucket") < 90).drop("bucket"),
        SignatureIndex.sourceCacheKey("docs90_gapp_p1_3", d))
      SignatureIndex.ensureSidecar(base, "gate_md5") { pth =>
        graft.Tables.documents(s, d).filter(bucket < 90)
          .select(md5(col("text")).as("c_md5")).distinct()
          .write.mode("overwrite").parquet(pth)
      }
      // the oracle's staged batches: doc_id-contiguous thirds of the
      // full table, bucket-filtered to the >=90 increment, plus the
      // trailing replay file (same staging the stream reads)
      val stagedDir = StreamingOps.stageDocBatches(s, d, 3, replayStage0 = true)
      val batchFiles = {
        import scala.jdk.CollectionConverters._
        scala.util.Using.resource(java.nio.file.Files.list(
          java.nio.file.Paths.get(stagedDir)))(
          _.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .toSeq.sortBy(_.getFileName.toString))
      }
      val origBucket = pmod(graft.functions.HashFunctions.hash32(
        pmod(col("doc_id"), lit(StreamingOps.ReplayIdOffset))
          .cast("string")), lit(100))
      var tCopy = System.nanoTime()
      IndexLifecycle.withMutableCopy(base) { idx =>
        println(f"[gapp]   ${"freshMutableCopy(sig)"}%-36s ${(System.nanoTime() - tCopy) / 1e9}%6.3f s")
        batchFiles.zipWithIndex.foreach { case (f, bid) =>
          println(s"[gapp]  -- trigger $bid (${f.getFileName}) --")
          val batch = s.read.schema(StreamingOps.documentsRawSchema)
            .parquet(f.toString).filter(origBucket >= 90)
          // inline replica of gateAndAppendBatch's body, step-timed
          val admitted = {
            val appDir = java.nio.file.Paths.get(idx, "gateapp_md5")
            val (extraMd5, excludeDocIds) = t("  sidecar read") {
              if (IndexLifecycle.hasParquet(appDir)) {
                val sc = s.read.parquet(appDir.toString)
                (Some(sc.filter(col("c_batch") =!= bid.toLong)
                   .select(col("c_md5"))),
                 Some(sc.filter(col("c_batch") === bid.toLong)
                   .select(col("c_doc").as("doc_id")).distinct()))
              } else (None, None)
            }
            val (b, admittedLazy) = t("  gateBatchPlan construct")(
              SignatureIndex.gateBatchPlan(batch, idx,
                Seq("doc_id", "lang", "source"), 5, 2, extraMd5,
                excludeDocIds, carryForAppend = true))
            val adm = t("  gate checkpoint")(admittedLazy.localCheckpoint(true))
            b.unpersist()
            val empty = t("  isEmpty")(adm.isEmpty)
            if (!empty) {
              t("  sidecar write")(
                adm.select(col("i_md5").as("c_md5"),
                    col("doc_id").as("c_doc"), lit(bid.toLong).as("c_batch"))
                  .coalesce(1)
                  .write.mode("append").parquet(appDir.toString))
              t("  appendToIndex")(
                SignatureIndex.appendToIndex(
                  adm.select(col("doc_id"), col("hs")), idx))
            }
            adm.select(Seq("doc_id", "lang", "source").map(col): _*)
          }
          t("sink write (foreachBatch twin)") {
            admitted.write.format("noop").mode("overwrite").save()
          }
          t("maintainIndex consult")(
            SignatureIndex.maintainIndex(s, idx)({
              val sigIds = s.read.parquet(s"$idx/sig")
                .select(col("doc_id")).distinct()
              hashedAll.unionByName(hashedAll.withColumn("doc_id",
                  col("doc_id") + lit(StreamingOps.ReplayIdOffset)))
                .join(sigIds, Seq("doc_id"), "left_semi")
            }))
        }
      }

      println(s"[gapp] ===== pass $p (ann gate-append shape) =====")
      val maxId = DataPipelineQueries.embeddingsMaxVecId(s, d)
      val thr = (maxId + 1) * 9 / 10
      val abase = AnnIndex.ensureAnnIndex(
        SignatureIndex.sourceCacheKey("annivf_gapp_p3", d,
          "embeddings.parquet"),
        stamp = "cents=16 iters=2 slice=base90 pristine") { pth =>
        AnnIndex.buildAnnIndex(
          graft.Tables.embeddings(s, d).filter(col("vec_id") < thr)
            .select(col("vec_id"), col("label"),
              Similarity.quantize(col("embedding")).as("qv")),
          DataPipelineQueries.trainedIvfCentroidsBase(s, d, thr), pth)
      }
      val vecDir = StreamingOps.stageVecBatches(s, d, 3, replayStage0 = true)
      val vecFiles = {
        import scala.jdk.CollectionConverters._
        scala.util.Using.resource(java.nio.file.Files.list(
          java.nio.file.Paths.get(vecDir)))(
          _.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .toSeq.sortBy(_.getFileName.toString))
      }
      tCopy = System.nanoTime()
      IndexLifecycle.withMutableCopy(abase) { aidx =>
        println(f"[gapp]   ${"freshMutableCopy(ann)"}%-36s ${(System.nanoTime() - tCopy) / 1e9}%6.3f s")
        vecFiles.zipWithIndex.foreach { case (f, bid) =>
          println(s"[gapp]  -- trigger $bid (${f.getFileName}) --")
          val batch = s.read.schema(StreamingOps.embeddingsRawSchema)
            .parquet(f.toString)
          // inline replica of gateAndAppendAnnBatch's body, step-timed
          val admitted = {
            val rows = batch.select(col("vec_id"), col("label"),
              Similarity.quantize(col("embedding")).as("qv"))
            val appDir = java.nio.file.Paths.get(aidx, "gapp_batches")
            val excl = t("  sidecar read") {
              if (IndexLifecycle.hasParquet(appDir))
                Some(s.read.parquet(appDir.toString)
                  .filter(col("batch") === bid.toLong)
                  .select(col("vec_id")).distinct())
              else None
            }
            val probes = rows.select(col("vec_id").as("probe_id"),
              col("qv").as("pqv"))
            val admLazy = t("  gate plan construct")(
              AnnIndex.gateBatchThroughAnnIndex(probes, aidx,
                DataPipelineQueries.EmbedDupThreshold, 4, excludeIds = excl))
            val adm = t("  gate checkpoint")(admLazy.localCheckpoint(true))
            val empty = t("  isEmpty")(adm.isEmpty)
            if (!empty) {
              t("  sidecar write")(
                adm.select(col("probe_id").as("vec_id"),
                    lit(bid.toLong).as("batch"))
                  .coalesce(1).write.mode("append").parquet(appDir.toString))
              t("  appendToAnnIndex") {
                val admRows = rows.join(
                  adm.select(col("probe_id").as("vec_id")),
                  Seq("vec_id"), "left_semi")
                AnnIndex.appendToAnnIndex(admRows, aidx)
              }
            }
            adm
          }
          t("sink write (foreachBatch twin)") {
            admitted.write.format("noop").mode("overwrite").save()
          }
          t("maintainAnnIndex consult")(AnnIndex.maintainAnnIndex(s, aidx))
        }
      }
      Dedup.purgeScratchDirs()
    }
    spark.stop()
  }
}
