package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev diagnostic (round-14, verdict ask #7): decompose the ~0.3-0.9 s
  * per-query floor the 49 sub-0.5 s batch queries pay at sf0.1 into
  * its parts, per query:
  *
  *   - BUILD: closure call — DataFrame construction (analysis);
  *   - PLAN:  force `queryExecution.executedPlan` — optimization +
  *     physical planning + (initial) codegen outside execution;
  *   - EXEC:  the noop write minus the above — job scheduling + task
  *     run + AQE re-planning, with the scheduled-job count;
  *
  * bracketed by the empty-job yardstick (spark.range → noop, the
  * irreducible scheduling round-trip on this host). If BUILD+PLAN
  * dominate, the floor is driver-side plan work (guide §7.3) and no
  * operator change helps; if EXEC dominates at k jobs ≈ k × yardstick,
  * the floor is job-count — fewer actions per query is the lever.
  *
  * Usage: scripts/run_main.sh graft.FloorProbe [sfDir] [names-csv|auto]
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names: Seq[String] =
      if (args.length > 1 && args(1) != "auto")
        args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Seq( // representative floor-bound set across families
        "q1_agg", "q5_semijoin", "q9_distinct", "q13_point_lookup",
        "q25_pivot", "q27_setops", "vpe_routing", "vpe_reid_only",
        "text_stats", "text_langid", "pipeline_validate",
        "pipeline_hll_distinct", "dedup_exact", "multimodal_meta")
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

    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm codegen/classloading once, like Bench
    SparkEntry.queries.get("q1_agg").foreach(fn => noop(fn(spark, sfDir)))

    // empty-job yardstick: one narrow stage over 1 partition
    def yardstick(): Double = {
      val t0 = System.nanoTime()
      noop(spark.range(0, 1, 1, 1).toDF("i"))
      (System.nanoTime() - t0) / 1e9
    }
    val ys = (1 to 5).map(_ => yardstick())
    println(f"[floor] empty-job yardstick: min ${ys.min}%.4f s, med ${ys.sorted.apply(2)}%.4f s")

    println("[floor] name                        build_s  plan_s  exec_s  jobs (3 passes each, min)")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force physical planning
        val t2 = System.nanoTime()
        val j0 = jobs.get()
        noop(df)
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9, jobs.get() - j0)
      }
      val b = samples.map(_._1).min
      val pl = samples.map(_._2).min
      val e = samples.map(_._3).min
      val j = samples.map(_._4).min
      println(f"[floor] $name%-28s $b%7.3f $pl%7.3f $e%7.3f  $j%4d")
    }
    spark.stop()
  }
}
