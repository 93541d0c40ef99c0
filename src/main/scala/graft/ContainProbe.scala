package graft

import org.apache.spark.sql.SparkSession

/** Cap-sensitivity + ladder probe for near-containment dedup
  * (SCALING.md §4.16): sweeps the rare-gram holder cap (64 → 128 →
  * 256) at each corpus size and records wall time + output pairs.
  * The claim under test: the candidate pair space is BUCKET-BOUNDED
  * (≤ cap²/2 per gram bucket), so raising the cap grows cost by at
  * most the admitted buckets' pair mass — no quadratic cliff — while
  * the OUTPUT pairs stay ~stable (the extra candidates are corpus
  * boilerplate that fails the 80% containment score; the planted
  * recall floor itself is spec-pinned in OperatorsSpec on a fixture
  * with known containment pairs, where it is checkable exactly).
  *
  * Measurement discipline = ScaleBench: min-of-2 with the cache
  * cleared per pass; scratch purged between caps so the disk high-
  * water mark stays one-cap-sized.
  */
object ContainProbe {

  def main(args: Array[String]): Unit = {
    val sizes = (if (args.nonEmpty) args(0) else "1000000,2000000")
      .split(",").map(_.trim.toLong).toSeq
    val caps = (if (args.length > 1) args(1) else "64,128,256")
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

    for (n <- sizes) {
      val dir = s"$base/n$n"
      ScaleGen.ensure(spark, dir, nDocs = n, nVecs = n / 2, nEvents = n * 2)
      for (cap <- caps) {
        def pass(): (Double, Long) = {
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val df = graft.queries.DataPipelineQueries
            .containmentPairs(spark, dir, cap)
          df.write.format("noop").mode("overwrite").save()
          ((System.nanoTime() - t0) / 1e9, df.count())
        }
        val (s1, _) = pass()
        val (s2, rows) = pass()
        println(f"""{"n_docs":$n,"query":"dedup_containment","gram_cap":$cap,""" +
          f""""sec":${math.min(s1, s2)}%.2f,"passes":[$s1%.2f,$s2%.2f],"rows":$rows}""")
        graft.operators.Dedup.purgeScratchDirs()
        System.gc()
      }
    }
    spark.stop()
  }
}
