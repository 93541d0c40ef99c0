package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps

/** Dev diagnostic (not a driver surface): prices the streaming EMBED
  * GATE's sf0.1 oracle cost the way SCALING.md §6 prices the other 16
  * stream oracles — as (micro-batch machinery floor) + (the per-batch
  * work the gate actually adds). Three measurements in one JVM, warm
  * passes separated from cold:
  *
  *  - `fb_identity`: [[StreamingOps.runForeachBatch]] over the SAME
  *    3-batch staged embeddings increment with an identity body — the
  *    foreachBatch floor (3 triggers, offset WAL, per-batch parquet
  *    sink write, final read-back) with zero gate logic;
  *  - `probe_only`: the gate's per-batch body run BATCH-mode over the
  *    same 3 staged batch files sequentially (probe the persisted ANN
  *    base index, admit below threshold) — the gate work with zero
  *    streaming machinery;
  *  - `gate`: the registry body itself (3-trigger stream_embed_gate).
  *
  * The §6 claim to check: gate ≈ fb_identity + probe_only − (the one
  * source-scan both halves count). */
object EmbedGateFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 4
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(body: () => Unit): Unit = {
      var cold = 0.0
      val warm = Seq.newBuilder[Double]
      for (i <- 1 to passes) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        body()
        val dt = (System.nanoTime() - t0) / 1e9
        if (i == 1) cold = dt else warm += dt
        System.err.println(f"[egfloor] $name pass $i: $dt%.2f s")
      }
      val w = warm.result()
      println(s"""{"shape":"$name","cold_s":${f"$cold%.3f"},""" +
        s""""warm_s":[${w.map(x => f"$x%.3f").mkString(",")}],""" +
        s""""warm_min_s":${f"${if (w.nonEmpty) w.min else cold}%.3f"}}""")
    }

    // shared artifacts built once up front (corpus events, not gate
    // cost — the same amortization the registry query gets)
    val idx = graft.queries.DataPipelineQueries.annBaseIndexPath(spark, sfDir)
    val staged = StreamingOps.stageVecBatches(spark, sfDir, 3)
    val batchFiles = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(staged)))(s =>
      scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
        .asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .toSeq.sortBy(_.toString))

    timed("fb_identity") { () =>
      StreamingOps.runForeachBatch(spark,
        StreamingOps.embeddingsStream(spark, sfDir, 3),
        "egfloor_identity", (batch, _) => batch)
        .write.format("noop").mode("overwrite").save()
    }

    timed("probe_only") { () =>
      for (f <- batchFiles) {
        val batch = spark.read
          .schema(StreamingOps.embeddingsRawSchema).parquet(f.toString)
        val probes = batch.select(col("vec_id").as("probe_id"),
          graft.operators.Similarity.quantize(col("embedding")).as("pqv"))
        val top1 = graft.operators.AnnIndex
          .probeAnnIndex(spark, idx, probes, nProbe = 4, k = 1)
          .select(col("probe_id"), col("score"))
        probes.select(col("probe_id")).join(top1, Seq("probe_id"), "left")
          .filter(col("score").isNull || col("score") <
            graft.queries.DataPipelineQueries.EmbedDupThreshold)
          .write.format("noop").mode("overwrite").save()
      }
    }

    timed("gate") { () =>
      graft.queries.StreamingQueries.embedGate(spark, sfDir, 3)
        .write.format("noop").mode("overwrite").save()
    }

    spark.stop()
  }
}
