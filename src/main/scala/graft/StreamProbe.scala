package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: run one streaming registry query and print the
  * per-batch StreamingQueryProgress JSONs (duration breakdown, state
  * rows, commit times) that runToMemory retains. Not a driver surface.
  *
  * Usage: runMain graft.StreamProbe <queryName> [sfDir]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("stream_enrich_join")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${Runtime.getRuntime.availableProcessors()}]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => spark.conf.set(k.trim, v.trim)
        case _ =>
      }
    })
    // 3rd arg: pass count — extra passes re-run warm in the same JVM so
    // per-pass cost is visible without cold-JVM classloading/codegen
    val passes = if (args.length > 2) args(2).toInt else 1
    for (i <- 1 to passes) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name pass $i total ${dt}%.2f s")
    }
    println(s"[probe] $name per-batch progress (last pass):")
    graft.streaming.StreamingOps.recentProgressJsons.foreach(println)
    spark.stop()
  }
}
