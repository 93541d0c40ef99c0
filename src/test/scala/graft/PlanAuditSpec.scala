package graft

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the scale properties ARCHITECTURE.md
  * claims must stay visible in the plans Catalyst actually produces. */
class PlanAuditSpec extends AnyFunSuite {
  import SparkTestSession._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.explainString(FormattedMode)

  test("q1_agg: filter pushed to parquet, columns pruned, partial agg") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey"), "unused columns must be pruned from the scan")
    assert(p.contains("partial_sum"), "map-side combine expected")
  }

  test("q2_join_dims: all dimension joins broadcast (fact side never shuffles pre-agg)") {
    val p = plan("q2_join_dims")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q5/q6: semi and anti joins broadcast") {
    assert(plan("q5_semijoin").contains("BroadcastHashJoin LeftSemi"))
    assert(plan("q6_antijoin").contains("BroadcastHashJoin LeftAnti"))
  }

  test("vpe_killlist: kill list applied as broadcast anti-join") {
    assert(plan("vpe_killlist").contains("BroadcastHashJoin LeftAnti"))
  }

  test("per-key top-k plans use partial top-k (WindowGroupLimit), not full sort") {
    assert(plan("vpe_similar_topk").contains("WindowGroupLimit"))
    assert(plan("q4_window_rank").contains("WindowGroupLimit"))
  }

  test("q3 global top-k is TakeOrdered, not a full sort") {
    assert(plan("q3_topk_orders").contains("TakeOrderedAndProject"))
  }

  test("q19_bucketed_join: bucket layout satisfies the join distribution — zero join-side shuffles") {
    val df = SparkEntry.queries("q19_bucketed_join")(spark, sf)
    val p = df.queryExecution.explainString(FormattedMode)
    assert(p.contains("SortMergeJoin"), s"merge join expected:\n$p")
    // the ONLY legal exchange is the presentation orderBy's range
    // partitioning ABOVE the join; a hashpartitioning exchange means
    // the bucket layout failed to satisfy the join's distribution
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed sides must not shuffle for the join:\n$p")
    assert(p.contains("Bucketed: true"),
      s"scan must report the bucketed layout:\n$p")
  }

  test("vpe_routed_topic: routing filter becomes topic/partition selection (before/after)") {
    import org.apache.spark.sql.functions._
    // the registered query installs the rule and builds the routed table
    SparkEntry.queries("vpe_routed_topic")(spark, sf).collect()
    val dir = graft.queries.PipelineQueries.routedTrackletsDir(spark, sf)
    def readFiltered() = graft.storage.RoutedStore.read(spark, dir)
      .filter(array_contains(col("dest_ports"), "reid"))
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.explainString(FormattedMode)

    // BEFORE: rule removed — the routing filter reads every topic dir
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev.filterNot(_ eq graft.plans.RoutingPushdown)
    val before = try planOf(readFiltered())
                 finally spark.experimental.extraOptimizations = prev
    assert("PartitionFilters: \\[[^\\]]*port".r.findFirstIn(before).isEmpty,
      s"without the rule the scan must be unpruned:\n$before")

    // AFTER: the rule conjoins port = 'reid' -> partition selection
    graft.plans.RoutingPushdown.install(spark)
    val after = planOf(readFiltered())
    assert("PartitionFilters: \\[[^\\]]*port".r.findFirstIn(after).isDefined &&
      after.contains("reid"),
      s"routing filter must land as a port PartitionFilter:\n$after")

    // disjunction: OR over two ports -> port IN (p1, p2)
    val orPlan = planOf(graft.storage.RoutedStore.read(spark, dir)
      .filter(array_contains(col("dest_ports"), "reid") ||
        array_contains(col("dest_ports"), "attr-recog")))
    assert("PartitionFilters: \\[[^\\]]*port[^\\]]*IN \\(".r
      .findFirstIn(orPlan).isDefined,
      s"port disjunction must become an IN partition filter:\n$orPlan")
  }

  test("stream subscription over RoutedStore lists only the subscribed port's files") {
    import java.nio.file.Files
    // the checkpoint's source log is the ground truth of what the file
    // stream DISCOVERED — subscription must keep un-subscribed topics
    // out of it entirely (the batch rule prunes the scan; a stream's
    // cost center is the per-trigger LISTING and the ever-growing
    // seen-file log, so pruning must happen at the source glob)
    val dir = graft.queries.PipelineQueries.routedTrackletsDir(spark, sf)
    val ckpt = Files.createTempDirectory("graft_sub_audit_")
    try {
      val sub = graft.storage.RoutedStore.subscribe(spark, dir, Seq("reid"))
      val q = sub.writeStream.format("memory").queryName("sub_audit")
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()

      val manifest = Files.readString(ckpt.resolve("sources").resolve("0").resolve("0"))
      val listed = "\"path\":\"([^\"]+)\"".r
        .findAllMatchIn(manifest).map(_.group(1)).toSeq
      assert(listed.nonEmpty, s"source log recorded no files:\n$manifest")
      assert(listed.forall(_.contains("/port=reid/")),
        s"un-subscribed topic files leaked into the source log:\n${listed.mkString("\n")}")
      // selectivity is real, not vacuous: other topics DO exist at rest
      assert(new java.io.File(dir).list().exists(_ == "port=tracklet-save"),
        "fixture must contain un-subscribed topic directories")
      // and the subscribed stream carries the port partition column +
      // exactly the reid topic's rows
      val streamed = spark.table("sub_audit")
      assert(streamed.columns.contains("port"))
      val expected = graft.storage.RoutedStore.read(spark, dir)
        .filter(org.apache.spark.sql.functions
          .array_contains(org.apache.spark.sql.functions.col("dest_ports"), "reid"))
        .count()
      assert(streamed.count() == expected,
        "subscription must yield exactly the subscribed topic's rows")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(ckpt.toFile)
  }

  test("vpe_partition_prune: day filter prunes partitions at the scan") {
    val df = SparkEntry.queries("vpe_partition_prune")(spark, sf)
    val p = df.queryExecution.explainString(FormattedMode)
    assert(p.contains("PartitionFilters:") && p.contains("day"),
      s"day filter must land as a PartitionFilter:\n$p")
    // the pruning must be real, not just printed: after execution the
    // scan's file metric covers only the 3 selected day-directories of
    // the ~30-day table
    df.collect()
    // descend through AQE wrappers AND materialized query stages (both
    // are leaf nodes to a plain collect)
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val inner = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allNodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allNodes(q.plan)
        case _ => Seq.empty
      }
      p +: (p.children.flatMap(allNodes) ++ inner)
    }
    val scans = allNodes(df.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec")
    val numFiles = scans.head.metrics("numFiles").value
    val totalDays = graft.storage.PartitionedStore.readEventsByDay(spark, sf)
      .select("day").distinct().count()
    assert(totalDays >= 25, s"fixture should span ~30 days, saw $totalDays")
    assert(numFiles > 0 && numFiles <= 6,
      s"scan must touch only the 3 queried days' files, read $numFiles")
  }

  test("custom vector expressions appear in plans (codegen path)") {
    val p = plan("vpe_similar_topk")
    assert(p.contains("dot_long") || p.toLowerCase.contains("dotproductlong"))
  }

  test("ann_ivf_trained: assignment is a pure projection, search joins on cell only") {
    val p = plan("ann_ivf_trained")
    assert(p.contains("l2sq_long"), "native distance kernel expected")
    assert(!p.contains("SortMergeJoin"),
      "cell-keyed search must not sort-merge at this scale (broadcast/hash)")
  }

  test("vpe_attr_mean: vector_mean aggregates in ONE shuffle, no explode") {
    val p = plan("vpe_attr_mean")
    assert(p.contains("vector_mean"), "VectorMean aggregate expected in plan")
    assert(!p.toLowerCase.contains("generate"), "no posexplode row multiplication")
    // partial on the map side, final after exactly one exchange between them
    val agg = "ObjectHashAggregate|SortAggregate".r.findAllIn(p).size
    assert(agg >= 2, s"partial+final aggregate pair expected, saw $agg")
  }

  test("text_repetition core is a pure projection: ZERO exchanges, no aggregate") {
    // Repetition stats are row-local; the plan must never shuffle the
    // tokenized corpus (the round-3 weak finding). Audit the core
    // (the registered query adds only the final presentation sort).
    val core = graft.queries.DataPipelineQueries
      .repetitionStats(graft.Tables.documents(spark, sf))
    val p = core.queryExecution.explainString(FormattedMode)
    assert(p.contains("repetition_stats"), "native kernel expected in plan")
    assert(!p.contains("Exchange"), s"zero shuffles expected:\n$p")
    assert(!p.contains("Aggregate"), s"no aggregate expected:\n$p")
    assert(!p.contains("Generate"), s"no explode expected:\n$p")
  }

  test("similarity pair joins never key on bare label (unbounded bucket)") {
    // A label group has no population bound, so a pair join keyed on
    // label alone is a quadratic block at corpus scale. Every equi-join
    // that involves `label` must carry at least one more key (the LSH
    // band columns).
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    for (name <- Seq("dedup_embed_neardup", "vpe_similar_topk")) {
      val joins = SparkEntry.queries(name)(spark, sf)
        .queryExecution.sparkPlan.collect { case j: BaseJoinExec => j }
      assert(joins.nonEmpty, s"$name: expected at least one equi-join")
      for (j <- joins) {
        val keyNames = j.leftKeys.flatMap(_.references.map(_.name))
        assert(!(keyNames.contains("label") && j.leftKeys.size == 1),
          s"$name: pair join keyed on bare label: ${j.leftKeys}")
      }
    }
  }

  test("pipeline_decontam: benchmark shingles broadcast, corpus never sort-merges") {
    val p = plan("pipeline_decontam")
    assert(p.contains("BroadcastHashJoin"),
      "the (small) benchmark shingle set must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "corpus-side joins must not regress to sort-merge")
    assert(p.contains("shingle_hash32"), "native shingle kernel expected")
  }

  test("pipeline_pack: running sum is per-shard, never a single-partition window") {
    val p = plan("pipeline_pack")
    assert(p.contains("hashpartitioning(shard"),
      "packing window must hash-exchange on the shard key")
    assert(!p.contains("SinglePartition"),
      "a global packing order would serialize the corpus through one partition")
  }

  test("dedup/minhash path runs on native kernels, not interpreted HOFs") {
    val p = plan("dedup_neardup_pairs")
    assert(p.contains("shingle_hash32"))
    assert(p.contains("minhash_sigs"))
    // the only lambda left is the 2-element band-slice transform; the
    // per-shingle md5 work must all be inside the native kernels
    assert(!p.contains("md5("),
      "no interpreted per-shingle md5 on the dedup hot path")
  }

  test("embed_centroids: vectors aggregate map-side BEFORE any explode") {
    val p = plan("embed_centroids")
    assert(p.contains("vector_sum_long"), "map-side vector-sum buffer expected")
    // the Generate (posexplode of the per-label sums) must sit ABOVE
    // the aggregation — exploding first would multiply the shuffle by
    // the vector width
    val genAt = p.indexOf("Generate")
    val aggAt = p.indexOf("vector_sum_long")
    assert(genAt >= 0 && aggAt >= 0 && genAt < aggAt,
      s"explode must consume the aggregate's output, not feed it:\n$p")
  }

  test("text_vocab: top-k is TakeOrdered; the global window runs on 200 rows, not the corpus") {
    val p = plan("text_vocab")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-200 must not materialize a global sort:\n$p")
    // the rank/cumsum window is single-partition BY DESIGN but must sit
    // above the TakeOrdered (bounded input), which the plan shows by
    // the window's child containing the limit
    assert(p.indexOf("TakeOrderedAndProject") > p.indexOf("Window"),
      "window must consume the limited row set (plan prints top-down)")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the corpus-total scalar must broadcast into the 200-row frame")
  }

  test("ann_index_topk: probed cells land as PartitionFilters; probes broadcast") {
    val p = plan("ann_index_topk")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"the cells scan must prune to the probed partitions:\n$p")
    assert(p.contains("BroadcastExchange"),
      "the probe-cell frame must broadcast into the candidate join")
    assert(!p.contains("SortMergeJoin"),
      "an index probe must never sort the corpus side")
  }

  test("ann_index_filtered: the metadata predicate rides the pruned scan") {
    val p = plan("ann_index_filtered")
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined)
    assert("PushedFilters: \\[[^\\]]*label".r.findFirstIn(p).isDefined,
      s"label predicate must push to parquet, not post-filter:\n$p")
  }

  test("pipeline_domain_mix: the sampling decision is scan-local (one aggregation exchange only)") {
    val p = plan("pipeline_domain_mix")
    // rows are kept by row-local hash math; the only exchanges allowed
    // are the per-source audit aggregation and the presentation sort
    // (formatted mode prints each node twice — tree + detail — so count
    // the numbered detail headers only)
    val ex = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(ex <= 2, s"expected only audit-agg + orderBy exchanges, saw $ex:\n$p")
    assert(p.contains("partial_count"), "audit must partial-aggregate map-side")
  }

  test("vpe_zorder_box: 2-D box prunes to the intersected Z-prefixes only") {
    val df = SparkEntry.queries("vpe_zorder_box")(spark, sf)
    val p = df.queryExecution.explainString(FormattedMode)
    assert(p.contains("PartitionFilters:") && p.contains("zp"),
      s"zp IN must land as a PartitionFilter:\n$p")
    df.collect()
    def allNodes(pl: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val inner = pl match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allNodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allNodes(q.plan)
        case _ => Seq.empty
      }
      pl +: (pl.children.flatMap(allNodes) ++ inner)
    }
    val nodes = allNodes(df.queryExecution.executedPlan)
    val scans = nodes.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, s"expected a FileSourceScanExec among:\n" +
      nodes.map(_.getClass.getSimpleName).mkString(", "))
    val numFiles = scans.head.metrics("numFiles").value
    val totalParts = graft.storage.ZOrderStore.readEventsByZ(spark, sf)
      .select("zp").distinct().count()
    // the box intersects 8 of the table's Z-partitions; a layout or
    // enumeration regression shows up as the scan touching more
    assert(totalParts >= 40, s"Z table should have ~60+ partitions, saw $totalParts")
    assert(numFiles > 0 && numFiles <= 10,
      s"scan must touch only the box's ~8 Z-partitions' files, read $numFiles")
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the executed plan)") {
    // order-of-magnitude key skew is handled by AQE splitting the hot
    // partition into subpartitions at runtime — the automatic half of
    // the skew story (Skew.saltedJoin is the manual half for the cases
    // AQE can't split). Thresholds lowered so the toy corpus triggers
    // the same decision a hot key triggers at 100 TB.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      // 95% of left rows share key 7; right side is modest and uniform
      val left = spark.range(200000).select(
        when(pmod($"id", lit(20)) < 19, 7L).otherwise(pmod($"id", lit(50))).as("k"),
        $"id".as("row_id"), concat(lit("pad_"), $"id").as("pad"))
      val right = spark.range(50).select($"id".as("k"), concat(lit("p"), $"id").as("payload"))
      // max(pad) keeps the unique-suffix column IN the shuffle: skew
      // detection reads compressed map-output sizes, and a partition of
      // identical keys alone compresses below any realistic threshold
      val joined = left.join(right, Seq("k"))
        .groupBy($"payload").agg(count(lit(1)).as("n"), max($"pad").as("m"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"expected AQE to mark the hot partition's merge join skew=true:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("pipeline_compact: 64 fragments become <=5 sorted files with identical data") {
    import org.apache.spark.sql.functions.col
    val dir = graft.queries.PipelineQueries.compactedEventsDir(spark, sf)
    def parquetFiles(d: String): Seq[java.io.File] =
      new java.io.File(d).listFiles().toSeq
        .filter(_.getName.endsWith(".parquet"))
    val fragDir = dir.replace("events_compacted", "events_fragmented")
    assert(parquetFiles(fragDir).size >= 48,
      s"fixture must be fragmented, saw ${parquetFiles(fragDir).size} files")
    val compacted = parquetFiles(dir)
    assert(compacted.nonEmpty && compacted.size <= 5,
      s"compaction must produce ~4 files, saw ${compacted.size}")
    // within-file sortedness is what keeps row-group min/max selective:
    // each file's rows must be ts-ascending
    for (f <- compacted) {
      val ts = spark.read.parquet(f.getAbsolutePath)
        .select(col("ts").cast("long")).collect().map(_.getLong(0))
      assert(ts.sameElements(ts.sorted), s"${f.getName} not sorted by ts")
    }
  }

  test("runtime bloom filter: a selective dim filter injects row-level pruning into the fact scan") {
    // the third shuffle-reduction lever next to broadcast and bucketing:
    // when a big-big join's build side carries a selective filter,
    // Catalyst can inject a bloom filter of the build keys into the
    // probe side, discarding non-joining fact rows BEFORE the shuffle —
    // at 100 TB this cuts the exchanged bytes by the join selectivity
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions.col
      val o = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      val l = Tables.lineitem(spark, sf)
      val joined = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_quantity"), col("o_totalprice"))
      val p = joined.queryExecution.explainString(FormattedMode)
      assert(p.contains("bloom_filter") || p.contains("BloomFilter"),
        s"expected an injected runtime bloom filter on the fact side:\n$p")
      assert(p.contains("SortMergeJoin"), "the demo needs the non-broadcast path")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q20_asof_join: no join node at all — union + window shuffles on the key only") {
    val p = plan("q20_asof_join")
    assert(!p.contains("Join"),
      s"as-of must be the union+window formulation, not an inequality join:\n$p")
    assert(p.contains("Window"), "running-last window expected")
    // legal exchanges: click pre-agg on (user_id, ts), the window's
    // user_id repartition, the presentation orderBy; anything more
    // means the formulation regressed
    val ex = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(ex <= 3, s"expected pre-agg + window + orderBy exchanges only, saw $ex:\n$p")
  }

  test("q21_range_join: bin keys make the interval predicate a broadcast EQUI-join") {
    val p = plan("q21_range_join")
    assert(p.contains("BroadcastHashJoin"), s"bin-key equi-join expected:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "a nested-loop/cartesian plan means the range predicate reached the join planner raw")
  }

  test("pipeline_hll_distinct: registers partial-aggregate map-side (max combine)") {
    val p = plan("pipeline_hll_distinct")
    assert(p.contains("partial_max"),
      s"register max must combine map-side — only (bucket, max rho) rows may shuffle:\n$p")
  }

  test("one-pass LSH: staged signature scan, hashed-key shuffle join, one exchange reused") {
    // the SCALING.md §4.6 plan shape, pinned: the md5/MinHash kernels
    // are paid ONCE at staging time, so the returned plan must read
    // the staged parquet and never re-hash text; the self-join legs
    // are the identical plan so the banding exchange is computed once
    // and the other leg reuses it; the shuffle key is one long
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.col
    val hashed = Dedup.shingleHashSets(
      graft.Tables.documents(spark, sf), "doc_id", "text", 5)
    val df = Dedup.lshJaccardPairs(hashed, 4, onePassMinDocs = 0)
    val pre = df.queryExecution.explainString(FormattedMode)
    assert(!pre.contains("shingle_hash32") && !pre.contains("minhash_sigs"),
      s"one-pass plan must read the STAGED signature table, not re-run kernels:\n$pre")
    assert(pre.contains("ShuffledHashJoin"),
      s"band self-join must be a shuffled hash join, not SMJ:\n$pre")
    assert(pre.contains("xxhash64(band"),
      s"shuffle key must be the single hashed long:\n$pre")
    // exchange reuse is finalized at runtime under AQE — execute THIS
    // Dataset's own QueryExecution (a write command would plan a fresh
    // one and leave this plan un-finalized), then read the final plan
    df.collect()
    val post = df.queryExecution.executedPlan.toString
    assert(post.contains("isFinalPlan=true"), s"expected an executed AQE plan:\n${post.take(1000)}")
    assert(post.contains("ReusedExchange") || post.contains("ReusedQueryStage"),
      s"identical legs must share ONE banding exchange:\n${post.take(4000)}")
  }

  test("bandedTop1Neighbor: pair rows partial-aggregate BEFORE the node shuffle") {
    // the §4.7 claim: pair-sized work stays inside the scan stage —
    // the per-node min(struct) must show a partial aggregate (map-side
    // combine) and the plan must contain no pair-keyed exchange
    // (no hashpartitioning on both pair ids)
    import graft.operators.Similarity
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
        Similarity.quantize(col("embedding")).as("qv"))
      .withColumn("bucket", Similarity.hyperplaneBucket(col("qv"), 64, 8))
    val df = Similarity.bandedTop1Neighbor(
      emb, Seq("label"), "vec_id", "bucket",
      payloadCol = "qv", score = Similarity.dotLong(_, _),
      bitsPerBand = 4, nBands = 2, refineQvCol = Some("qv"))
    val p = df.queryExecution.explainString(FormattedMode)
    assert(p.contains("partial_min"),
      s"per-node best must combine map-side before the only shuffle:\n$p")
    assert(!p.contains("hashpartitioning(id_a") && !p.contains("hashpartitioning(src, dst"),
      s"no pair-keyed exchange may exist — only node-sized rows shuffle:\n$p")
  }

  test("dedup_span_ngrams: gram count combines map-side; no cartesian anywhere") {
    val p = plan("dedup_span_ngrams")
    assert(p.contains("partial_count"),
      s"the corpus-sized gram groupBy must map-side combine:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span detection must stay join-keyed:\n$p")
  }

  test("gram channel never shuffles the gram STRING (§4.10: 96-bit hashed keys)") {
    // the corpus-position-sized exchanges must carry (g1, g2), not the
    // ~50-byte 8-token gram text — the 4M-rung defect was exactly a
    // string-keyed hashpartitioning(gram) here. dedup_containment's
    // gram phase is audited through its LAZY candidate plan (round 13
    // checkpoints the pair set, hiding the phase behind a Scan
    // ExistingRDD in the full query plan).
    val spanP = plan("dedup_span_ngrams")
    assert(spanP.contains("hashpartitioning(g1"),
      s"span must exchange on the hashed gram key:\n$spanP")
    assert(!spanP.contains("hashpartitioning(gram"),
      s"span shuffles raw gram strings (§4.10 regression):\n$spanP")
    val containP = graft.queries.DataPipelineQueries
      .containmentCandidates(spark, sf, 64)
      .queryExecution.explainString(FormattedMode)
    // the rare-count aggregate exchanges on the hashed (g1, g2) key —
    // no exchange may carry a gram STRING (the kernel never
    // materializes one since round 13)
    assert(containP.contains("hashpartitioning(g1"),
      s"containment must key its gram exchanges on the hashed key:\n$containP")
    assert(!containP.contains("hashpartitioning(gram") &&
      !containP.contains("concat_ws"),
      s"containment materializes/shuffles gram strings (§4.10 regression):\n$containP")
  }

  test("q28_grouping_sets: all grains from ONE scan through ONE Expand") {
    val p = plan("q28_grouping_sets")
    assert(p.contains("Expand"))
    // FormattedMode shows each node once in the tree and once in the
    // numbered detail list — count the detail entries
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).size == 1,
      s"multi-grain aggregate must not rescan the fact table per grain:\n$p")
    assert(!p.contains("Union"),
      s"grouping sets must plan as Expand, not a UNION of aggregates:\n$p")
  }

  test("dedup_incremental: index probe — semi-pruned corpus scan, band-keyed pairs") {
    val p = plan("dedup_incremental")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"increment×corpus must pair only inside shared band buckets:\n$p")
    // the cross-corpus band join carries band + band_sig as equi keys
    assert(p.contains("band"), p)
    // the round-9 index shape: the corpus side is the PERSISTED
    // signature index, pruned by the increment's broadcast band keys
    // BEFORE any exchange — never re-hashed (no shingle kernels on the
    // corpus leg) and never corpus-shuffled
    assert(p.contains("LeftSemi"),
      s"corpus index scan must be semi-pruned by increment band keys:\n$p")
  }

  test("dedup_containment: slim pair channel — payload never rides the gram join") {
    // the MEASURED shape (SCALING.md §4.15): co-locating the shingle
    // sets in the gram self-join multiplies payload by per-doc gram
    // MEMBERSHIP (~90× on duplicated docs — unbounded, unlike LSH's
    // nBands) and overflowed the disk at 1M docs; the slim channel
    // collapses memberships to DISTINCT pairs first and fetches
    // payloads by pair id (|pairs| ≈ memberships/90). This pins the
    // choice: the gram self-join must NOT carry the set payload...
    // round 13: the pair channel is checkpointed, so the gram phase is
    // audited on the LAZY candidate plan and the payload-fetch shape
    // on the full query plan (where the checkpoint appears as the slim
    // Scan ExistingRDD the fetch joins read).
    val c = graft.queries.DataPipelineQueries
      .containmentCandidates(spark, sf, 64)
      .queryExecution.explainString(FormattedMode)
    // gram-keyed self-join present (detail section lists join keys)
    assert("""keys \[2\]: \[g1#""".r.findFirstIn(c).isDefined,
      s"gram self-join missing:\n$c")
    // the candidate channel is SLIM: no shingle-set payload column may
    // appear anywhere in the pair-generation plan
    assert(!c.contains("hsi") && !c.contains("shingle"),
      s"payload riding the gram join (§4.15 regression):\n$c")
    // memberships collapse to distinct pairs before any payload moves
    assert("""Keys \[2\]: \[id_a#""".r.findFirstIn(c).isDefined,
      s"distinct pair collapse missing:\n$c")
    assert(!c.contains("CartesianProduct") &&
      !c.contains("BroadcastNestedLoopJoin"), c)
    val p = plan("dedup_containment")
    // the payload-fetch joins BY PAIR ID are the chosen shape — the
    // co-located form has no id_a-keyed join, so their presence is the
    // regression guard against re-introducing the §4.15 blow-up
    assert("""keys \[1\]: \[id_a#""".r.findFirstIn(p).isDefined &&
           """keys \[1\]: \[id_b#""".r.findFirstIn(p).isDefined,
      s"pair-id payload fetch missing (payload riding the gram join?):\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }
  test("no registry plan ships an unbounded single-partition Window") {
    // WindowExec with an empty partitionSpec funnels its whole input
    // through ONE partition's sort — fine over a provably bounded
    // frame (below a limit or an aggregation), a scale-killer over a
    // corpus-sized one. The two shipped sites (Sketches' cumulative
    // bin sum over a 256-group aggregate, the tf-idf top-k tail over
    // a vocabulary aggregate) are bounded; this audit machine-checks
    // that NO registry query ever introduces an unbounded one.
    // stream_* queries are skipped: building their frame runs the
    // stream, and the returned sink-read plan carries no Window.
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- SparkEntry.queries if !name.startsWith("stream_")) {
      unboundedGlobalWindows(fn(spark, sf)).foreach(w => offenders += s"$name: $w")
    }
    assert(offenders.isEmpty,
      s"unbounded global-Window plans (add a partitionBy or bound the frame):\n${offenders.mkString("\n")}")
  }

  test("no registry plan ships a wide literal IN chain") {
    // the §4.17/round-11 defect class (the "PQ lesson"): a predicate
    // built as isin(ids: _*) over a data-derived set plans one
    // expression-tree child PER VALUE — √N children at IVF cell
    // counts, ~10^5 at 10^10 vectors — and the analyzer walks that
    // tree on every invocation. The engine's rule (AnnIndex
    // .IsinCellsMax): literal IN only up to 64 values; above, ONE
    // array_contains array literal (same PartitionFilter pruning) or
    // a broadcast semi. This audit machine-checks every registered
    // batch query's analyzed plan for a violation of that rule.
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, fn) <- SparkEntry.queries if !name.startsWith("stream_")) {
      wideLiteralIns(fn(spark, sf)).foreach(w => offenders += s"$name: $w")
    }
    assert(offenders.isEmpty,
      s"wide literal IN chains (use array_contains on one array " +
        s"literal, or a broadcast semi):\n${offenders.mkString("\n")}")
  }

  /** Audit predicate for the IN-chain test, factored for its negative
    * control. */
  private def wideLiteralIns(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{In, Literal}
    val out = scala.collection.mutable.ArrayBuffer[String]()
    df.queryExecution.analyzed.foreach { node =>
      node.expressions.foreach(_.foreach {
        case in: In if in.list.size > graft.operators.AnnIndex.IsinCellsMax &&
            in.list.forall(_.isInstanceOf[Literal]) =>
          out += s"In over ${in.list.size} literals"
        case _ => ()
      })
    }
    out.toSeq
  }

  test("IN audit negative control: a wide literal chain IS flagged; narrow and non-literal are not") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val wide = docs.filter(col("doc_id").isin(0L to 100L: _*))
    assert(wideLiteralIns(wide).nonEmpty, "a 101-literal IN escaped the audit")
    val narrow = docs.filter(col("doc_id").isin(0L to 10L: _*))
    assert(wideLiteralIns(narrow).isEmpty, "a narrow IN was flagged")
    val arrayForm = docs.filter(
      array_contains(lit((0L to 100L).toArray), col("doc_id")))
    assert(wideLiteralIns(arrayForm).isEmpty, "array_contains form flagged")
  }

  /** The audit predicate, factored so the negative control below can
    * prove it actually fires. */
  private def unboundedGlobalWindows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, Window => LWindow}
    val out = scala.collection.mutable.ArrayBuffer[String]()
    df.queryExecution.optimizedPlan.foreach {
      case w: LWindow if w.partitionSpec.isEmpty =>
        val bounded = w.child.collectFirst {
          case _: GlobalLimit => true
          case _: LocalLimit  => true
          case _: Aggregate   => true
        }.isDefined
        if (!bounded) out += w.simpleString(80)
      case _ => ()
    }
    out.toSeq
  }

  test("window audit negative control: an unbounded global Window IS flagged; bounded forms are not") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val unbounded = docs.withColumn("rn",
      row_number().over(Window.orderBy(col("doc_id"))))
    assert(unboundedGlobalWindows(unbounded).nonEmpty,
      "a corpus-wide single-partition Window escaped the audit")
    val limited = docs.limit(100).withColumn("rn",
      row_number().over(Window.orderBy(col("doc_id"))))
    assert(unboundedGlobalWindows(limited).isEmpty, "limit-bounded window flagged")
    val agged = docs.groupBy(col("lang")).count().withColumn("rn",
      row_number().over(Window.orderBy(col("lang"))))
    assert(unboundedGlobalWindows(agged).isEmpty, "aggregation-bounded window flagged")
    val partitioned = docs.withColumn("rn",
      row_number().over(Window.partitionBy(col("lang")).orderBy(col("doc_id"))))
    assert(unboundedGlobalWindows(partitioned).isEmpty, "partitioned window flagged")
  }
}
