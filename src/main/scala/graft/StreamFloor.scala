package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Dev diagnostic (not a driver surface): measures the PER-TRIGGER
  * floor of Structured Streaming's micro-batch machinery on this host,
  * isolated from any registry query's own logic. Three minimal shapes
  * over the same 3-batch staged file source the streaming oracles use:
  *
  *   - passthrough: projection only — no state, no watermark. Pays
  *     source listing, offset WAL, incremental re-plan, one stage of
  *     tasks, memory-sink collect.
  *   - dedup: dropDuplicates on a 2-col key — adds one stateful
  *     operator (4 state stores, load/commit per batch).
  *   - join: self equi-join with ±10-min interval + watermarks — adds
  *     the 4-stores-per-partition symmetric join and a second scan of
  *     the source.
  *
  * Each shape runs `passes` times in ONE JVM; the first (cold) pass is
  * reported separately from the warm passes. Per-batch durations come
  * from StreamingQueryProgress. The point: if (warm wall) ≈ (triggers ×
  * floor of the matching shape), a streaming oracle's cost is Spark's
  * micro-batch machinery priced at toy scale, not a defect in the
  * registered plan — the decomposition SCALING.md §6 documents.
  */
object StreamFloor {
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

    def passthrough() = StreamingOps.eventsStream(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"))
    def dedup() = StreamingOps.eventsStream(spark, sfDir)
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
    def join() = {
      val ev = StreamingOps.eventsStream(spark, sfDir)
      val l = ev.select(col("event_id"), col("ts"), col("user_id"))
        .withWatermark("ts", "10 minutes")
      val r = ev.select(col("event_id").as("rid"), col("ts").as("rts"),
        col("value")).withWatermark("rts", "10 minutes")
      l.join(r, col("event_id") === col("rid") &&
        col("rts") >= col("ts") - expr("INTERVAL 10 minutes") &&
        col("rts") <= col("ts") + expr("INTERVAL 10 minutes"))
        .select(col("event_id"), col("user_id"), col("value"))
    }

    // fMGWS: one flatMapGroupsWithState counter per key — the minimal
    // state-init/cross-batch-carry shape stream_completion[_ttl] and
    // stream_asof_enrich pay (groupByKey shuffle + per-partition state
    // store load/commit + per-key state rows)
    def fmgws() = {
      import spark.implicits._
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      StreamingOps.eventsStream(spark, sfDir)
        .select(col("user_id"), col("event_id")).as[(Long, Long)]
        .groupByKey(_._1)
        .flatMapGroupsWithState[Long, (Long, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout) {
          (k: Long, it: Iterator[(Long, Long)], st: GroupState[Long]) =>
            val n = st.getOption.getOrElse(0L) + it.size
            st.update(n)
            Iterator.single((k, n))
        }.toDF("user_id", "n")
    }

    val shapes = Seq(
      ("passthrough", () => passthrough()),
      ("dedup", () => dedup()),
      ("join", () => join()),
      ("fmgws", () => fmgws()))
    val out = new StringBuilder("{\n")
    shapes.zipWithIndex.foreach { case ((name, mk), si) =>
      var cold = 0.0
      val warm = Seq.newBuilder[Double]
      var batches: Seq[(Long, Long)] = Nil // (batchId, durationMs)
      for (i <- 1 to passes) {
        val t0 = System.nanoTime()
        StreamingOps.runToMemory(spark, mk(), s"floor_$name", "append")
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (i == 1) cold = dt else warm += dt
        System.err.println(f"[floor] $name pass $i: $dt%.2f s")
        batches = StreamingOps.recentProgressJsons.map { j =>
          val id = "\"batchId\":(\\d+)".r.findFirstMatchIn(j).map(_.group(1).toLong).getOrElse(-1L)
          val dur = "\"triggerExecution\":(\\d+)".r.findFirstMatchIn(j).map(_.group(1).toLong).getOrElse(-1L)
          (id, dur)
        }
      }
      val w = warm.result()
      val wMin = if (w.nonEmpty) w.min else cold
      out.append(s"""  "$name": {"cold_s": ${f"$cold%.3f"}, "warm_s": [${w.map(x => f"$x%.3f").mkString(",")}], "warm_min_s": ${f"$wMin%.3f"}, "triggers": ${batches.length}, "per_trigger_ms": [${batches.map(_._2).mkString(",")}]}""")
      out.append(if (si < shapes.length - 1) ",\n" else "\n")
    }
    // recover: the checkpoint-restart shape stream_recover pays — the
    // SAME minimal stateful stream run through runWithRestart (durable
    // parquet sink + commit log, RocksDB + changelog pinned, one query
    // started, killed after its first committed batch, a second query
    // recovered from the checkpoint and drained). Priced as wall time
    // per full kill/recover cycle: TWO query startups, offset/commit
    // recovery, state reload, sink-log read-back.
    locally {
      var cold = 0.0
      val warm = Seq.newBuilder[Double]
      for (i <- 1 to passes) {
        val t0 = System.nanoTime()
        StreamingOps.runWithRestart(spark, () => dedup(), "floor_recover")
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (i == 1) cold = dt else warm += dt
        System.err.println(f"[floor] recover pass $i: $dt%.2f s")
      }
      val w = warm.result()
      val wMin = if (w.nonEmpty) w.min else cold
      out.append(",\n")
      out.append(s"""  "recover": {"cold_s": ${f"$cold%.3f"}, "warm_s": [${w.map(x => f"$x%.3f").mkString(",")}], "warm_min_s": ${f"$wMin%.3f"}}""")
      out.append("\n")
    }
    out.append("}")
    println(out.toString)
    spark.stop()
  }
}
