package graft

import java.lang.management.ManagementFactory

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Dev diagnostic for SCALING.md §4.9: the one-pass LSH near-dup FAT
  * band self-join went unstable at the 4M-doc rung (162–709 s across
  * runs/heaps, worse with a LARGER heap) while every structural
  * observable — candidate count, refined-bucket populations, the
  * skinny join — stayed healthy. The suspects are single-JVM resource
  * pathologies, not plan shapes:
  *
  *   (a) 32 concurrent SHUFFLE_HASH build relations holding the whole
  *       keyed table on ONE heap (a cluster holds build/executors per
  *       executor) — GC churn;
  *   (b) page-cache starvation: the staged signature table re-written
  *       per operator pass while a big heap squeezes the cache the
  *       shuffle spill files and parquet reads live in.
  *
  * This probe separates them: the signature table is staged ONCE
  * (`Dedup.probeKeyed`), then each join variant runs `passes` warm
  * passes over that same staged table, with per-pass wall time, GC
  * time delta (collector MXBeans) and peak heap-pool usage printed.
  * Variants (comma list, 2nd arg):
  *   sh      — SHUFFLE_HASH at spark.sql.shuffle.partitions (the
  *             shipped shape; expected to reproduce the §4.9 blowup)
  *   smj     — MERGE: external sort spills instead of building
  *   shN     — SHUFFLE_HASH over an explicit N-partition exchange
  *             (e.g. sh256): same strategy, 8× smaller concurrent
  *             build footprint
  *   smjN    — MERGE over an explicit N-partition exchange
  *
  * If pass-2 degradation vanishes here (no re-staging) the §4.9
  * degradation was page-cache churn; if `sh` stays slow with high GC
  * while `smj`/`shN` are flat, the first pass cost is build-relation
  * heap pressure. Usage:
  *   SPARK_DRIVER_MEM=32g sbt "runMain graft.FatJoinProbe 4000000 sh,smj,sh256 2"
  */
object FatJoinProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 4000000L
    val variants = (if (args.length > 1) args(1) else "sh,smj,sh256").split(",").toSeq
    val passes = if (args.length > 2) args(2).toInt else 2
    val rowsPerBand = 4
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
    val base = sys.env.getOrElse("GRAFT_SCALE_BASE", "target/scale")
    val dir = s"$base/n$nDocs"
    ScaleGen.ensure(spark, dir, nDocs = nDocs, nVecs = nDocs / 2,
      nEvents = nDocs * 2)

    import graft.operators.Dedup
    val hashed = Dedup.shingleHashSets(
      Tables.documents(spark, dir).repartition(col("doc_id")),
      "doc_id", "text", 5)
    // staged ONCE for every variant/pass below — isolates the join from
    // the per-pass re-staging the ladder does
    val t0 = System.nanoTime()
    val keyed = Dedup.probeKeyed(hashed, rowsPerBand)
    println(f"[fatjoin-probe] stage ${(System.nanoTime() - t0) / 1e9}%.2f s")

    def gcMs: Long = ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
    val heapPools = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)

    val shN = "^sh(\\d+)$".r
    val smjN = "^smj(\\d+)$".r
    for (v <- variants) {
      val df = v match {
        case "sh"     => Dedup.fatJoinPairs(keyed, "SHUFFLE_HASH", None)
        case "smj"    => Dedup.fatJoinPairs(keyed, "MERGE", None)
        case shN(n)   => Dedup.fatJoinPairs(keyed, "SHUFFLE_HASH", Some(n.toInt))
        case smjN(n)  => Dedup.fatJoinPairs(keyed, "MERGE", Some(n.toInt))
        case other    => throw new IllegalArgumentException(s"unknown variant $other")
      }
      var failed = false
      for (p <- 1 to passes if !failed) {
        heapPools.foreach(_.resetPeakUsage())
        val g0 = gcMs
        val t = System.nanoTime()
        // a variant that cannot run at this rung (e.g. SHUFFLE_HASH
        // OOMing its build relations) is itself a measurement — record
        // it and keep probing the alternatives
        try {
          df.write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t) / 1e9
          val peakGb = heapPools.map(_.getPeakUsage.getUsed).sum / 1e9
          println(f"[fatjoin-probe] variant=$v%-6s pass=$p wall=$wall%8.2f s " +
            f"gc=${gcMs - g0}%6d ms peakHeap=$peakGb%6.1f GB")
        } catch { case e: Throwable =>
          failed = true
          val root = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
            .toSeq.last
          // getMessage is null for bare NPE/OOM roots — the handler must
          // not itself NPE and mask the failure it exists to record
          val msg = Option(root.getMessage)
            .flatMap(_.linesIterator.nextOption()).getOrElse("<no message>")
          println(f"[fatjoin-probe] variant=$v%-6s pass=$p FAILED after " +
            f"${(System.nanoTime() - t) / 1e9}%.1f s: ${root.getClass.getSimpleName}: " +
            msg)
        }
      }
    }
    spark.stop()
  }
}
