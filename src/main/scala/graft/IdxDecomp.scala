package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SignatureIndex}

/** One-off stage decomposition of probeSignatureIndex at a rung
  * (round-10: which stage carries the 16M probe's 48 s?). */
object IdxDecomp {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.getOrElse("16000000").toLong
    val base = sys.env.getOrElse("GRAFT_SCALE_BASE", "target/scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val idxDir = s"$base/sigidx_n$n"
    val incDir = s"$base/inc100k_from$n"
    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
    }
    // stage 1: increment hashing + scratch staging (what probe pays up front)
    val incHashed = Dedup.shingleHashSets(
      spark.read.parquet(incDir), "doc_id", "text", 5)
    val incScratch = java.nio.file.Files.createTempDirectory("graft_idxdecomp_")
    Dedup.registerScratchDir(incScratch)
    val (tStage, _) = t { incHashed.limit(1).count() } // warmup
    val (tIncStage, _) = t {
      // mirror probe's staging cost: hash + write sig columns
      import org.apache.spark.sql.graft.HashExpressions
      incHashed.select(col("doc_id"),
        HashExpressions.minhash_sigs(col("hs")).as("sig"),
        HashExpressions.minhash_extra_bits(col("hs")).as("_xb"),
        xxhash64(col("hs")).as("_salt"),
        array_sort(transform(col("hs"),
          h => (h - 2147483648L).cast("int"))).as("hsi"))
        .write.mode("overwrite").parquet(incScratch.toString + "/sig")
    }
    // stage 2: full probe, timed end to end for reference
    val (tProbe, nPairs) = t {
      val df = SignatureIndex.probeSignatureIndex(incHashed, idxDir)
      df.write.format("noop").mode("overwrite").save()
      df.count()
    }
    println(f"""{"n":$n,"warmup_sec":$tStage%.1f,"inc_stage_sec":$tIncStage%.1f,""" +
      f""""probe_total_sec":$tProbe%.1f,"pairs":$nPairs}""")
    Dedup.purgeScratchDirs()
    spark.stop()
  }
}
