package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators._

/** VPE-domain pipeline operators (SURVEY §2) demonstrated end-to-end
  * over the testdata, each with a DuckDB oracle. The `events` table
  * plays the role of the detection stream (one event = one bbox
  * observation); `embeddings` plays the Feature1024 store.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  /** vpe_tracklets: tracking stage output (X1 tracker grouping + T3
    * chronological serials + F1 tracklet id). */
  private val vpe_tracklets: Q = (s, d) => {
    Tracking.trackletSummaries(Tracking.detectionsFromEvents(Tables.events(s, d)))
      .select(col("video_id"), col("serial"), col("tracklet_id"),
        col("start_frame"), col("end_frame"), col("n_boxes"), col("num_tracklets"))
      .orderBy(col("video_id"), col("serial"))
  }

  /** vpe_sample_even: A2 even-interval sampling — the real array
    * operator (Sampling.evenSampleIndicesCol) summarized to scalars the
    * oracle reproduces in closed form. */
  private val vpe_sample_even: Q = (s, d) => {
    val tr = Tracking.trackletSummaries(
      Tracking.detectionsFromEvents(Tables.events(s, d)))
    val kept = Sampling.evenSampleIndicesCol(col("n_boxes").cast("int"), 5)
    tr.select(col("tracklet_id"), col("n_boxes"), kept.as("kept"))
      .select(col("tracklet_id"), col("n_boxes"),
        size(col("kept")).cast("long").as("n_kept"),
        element_at(col("kept"), 1).cast("long").as("first_kept"),
        element_at(col("kept"), -1).cast("long").as("last_kept"))
      .orderBy(col("tracklet_id"))
  }

  /** vpe_attr_mean: A1 mean of per-sample attribute vectors, via the
    * distributed posexplode aggregation (AttributeOps.meanVectors),
    * 4 demo dims of the 128-dim surface. */
  private val vpe_attr_mean: Q = (s, d) => {
    val det = Tracking.detectionsFromEvents(Tables.events(s, d))
      .withColumn("attrs", AttributeOps.fakeAttributeVector(col("frame_idx"), 4))
    AttributeOps.meanVectors(det, Seq("video_id", "obj_key"), "attrs")
      .select(col("video_id"), col("obj_key"),
        round(element_at(col("mean_vec"), 1), 4).as("mean_a0"),
        round(element_at(col("mean_vec"), 2), 4).as("mean_a1"),
        round(element_at(col("mean_vec"), 3), 4).as("mean_a2"),
        round(element_at(col("mean_vec"), 4), 4).as("mean_a3"),
        col("n_samples"))
      .orderBy(col("video_id"), col("obj_key"))
  }

  /** vpe_attr_mean_full: A1 at REFERENCE WIDTH — the same VectorMean
    * aggregate over the full 128-attribute surface (AttributeNames
    * size, the reference's DeepMAR FC8 width). Every one of the 128
    * means is rounded to 4 dp and checksummed (first/last dims spot-
    * checked explicitly), so the full-width aggregate is oracle-proven
    * like vpe_attr_named's attr_sum — not just the 4-dim demo. The
    * per-dim rounding BEFORE the checksum sum keeps the 128-term
    * double summation ulp-stable across engines. */
  private val vpe_attr_mean_full: Q = (s, d) => {
    val dims = graft.functions.AttributeNames.size
    val det = Tracking.detectionsFromEvents(Tables.events(s, d))
      .withColumn("attrs", AttributeOps.fakeAttributeVector(col("frame_idx"), dims))
    AttributeOps.meanVectors(det, Seq("video_id", "obj_key"), "attrs")
      .select(col("video_id"), col("obj_key"),
        round(element_at(col("mean_vec"), 1), 4).as("mean_first"),
        round(element_at(col("mean_vec"), dims), 4).as("mean_last"),
        round(aggregate(transform(col("mean_vec"), x => round(x, 4)),
          lit(0.0), (acc, x) => acc + x), 4).as("mean_sum"),
        col("n_samples"))
      .orderBy(col("video_id"), col("obj_key"))
  }

  /** vpe_reid_join: the ReID stream join (J1 full outer on the
    * composite key + P5 presence split + U1-style reconciliation),
    * batch form: tracklet summaries ⟗ attribute means. */
  private val vpe_reid_join: Q = (s, d) => {
    val tr = Tracking.trackletSummaries(
      Tracking.detectionsFromEvents(Tables.events(s, d)))
      .select(col("video_id"), col("obj_key"), col("tracklet_id"), col("n_boxes"))
      // simulate late/missing attrs legs: attrs only exist for some keys
    val det = Tracking.detectionsFromEvents(Tables.events(s, d))
      .filter(col("obj_key") =!= "error")
      .withColumn("attrs", AttributeOps.fakeAttributeVector(col("frame_idx"), 4))
    val am = AttributeOps.meanVectors(det, Seq("video_id", "obj_key"), "attrs")
      .select(col("video_id"), col("obj_key"),
        round(element_at(col("mean_vec"), 1), 4).as("attr0"), col("n_samples"))
    tr.join(am, Seq("video_id", "obj_key"), "full_outer")
      .select(col("video_id"), col("obj_key"), col("tracklet_id"),
        col("n_boxes"), col("attr0"), col("n_samples"),
        when(col("tracklet_id").isNotNull && col("attr0").isNotNull, "matched")
          .when(col("tracklet_id").isNotNull, "tracklet_only")
          .otherwise("attr_only").as("presence"))
      .orderBy(col("video_id"), col("obj_key"))
  }

  /** vpe_reid_rank: X3/T2 IDRank — rank candidate gallery per probe by
    * exact quantized dot product (X4 comparer kernel), top-5. */
  private val vpe_reid_rank: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val probes = emb.filter(col("vec_id") < 10)
    Similarity.bruteForceTopK(probes, emb, "vec_id", "embedding", 5)
      .orderBy(col("probe_id"), col("rank"))
  }

  /** vpe_similar_topk: G9/T1 top-k similar per person (ORDER BY
    * similarity DESC over out-edges, `Neo4jConnector.java:752-779`) —
    * neighbors share the label AND an LSH band of the hyperplane
    * bucket, scored by exact quantized dot product. The pair join key
    * is (label, band, band_val), never bare label: label groups grow
    * with the corpus (quadratic blocks + hot shuffle keys at 100×),
    * while the sub-buckets stay hyperplane-bounded. Each unordered
    * pair is scored once, then ranked from both endpoints. */
  private val vpe_similar_topk: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), Similarity.quantize(col("embedding")).as("qv"))
      .withColumn("bucket", Similarity.hyperplaneBucket(col("qv"), 64, 8))
      .cache()
    // refineQvCol: see dedup_embed_neardup — banded keys grow linearly
    // with the corpus, hot ones get observed-population refinement
    // (no-op at oracle SFs, so the SQL twin is unchanged). Scored
    // inside the band-local join (SCALING.md §4.4), never re-joining
    // the corpus per pair id.
    val scored = Similarity.bandedScoredPairs(
      emb, Seq("label"), "vec_id", "bucket",
      payloadCol = "qv", score = Similarity.dotLong(_, _),
      bitsPerBand = 4, nBands = 2, refineQvCol = Some("qv"))
    val directed = scored
      .select(col("id_a").as("src"), col("id_b").as("dst"), col("score"))
      .unionByName(scored
        .select(col("id_b").as("src"), col("id_a").as("dst"), col("score")))
    Similarity.topKPerKey(directed, "src", "score", "dst", 3)
      .select(col("src"), col("rank"), col("dst"), col("score"))
      .orderBy(col("src"), col("rank"))
  }

  /** vpe_routing: P1/P2 port-routing filters + U3 plan merge — build
    * dest_ports arrays per record, then count consumption per port
    * (array_contains = the Stream.filter of the reference). */
  private val vpe_routing: Q = (s, d) => {
    val env = Tables.events(s, d).select(
      col("event_id"),
      when(col("event_type") === "click", array(lit("attr-recog"), lit("save")))
        .when(col("event_type") === "purchase", array(lit("attr-recog"), lit("reid"), lit("save")))
        .when(col("event_type") === "view", array(lit("save")))
        .otherwise(array(lit("monitor"))).as("dest_ports"))
    val ports = Seq("attr-recog", "reid", "save", "monitor")
    ports.map { p =>
      env.filter(array_contains(col("dest_ports"), p))
        .agg(count(lit(1)).as("n_records"))
        .select(lit(p).as("port"), col("n_records"))
    }.reduce(_ unionByName _)
      .orderBy(col("port"))
  }

  /** vpe_claim_check: O3 payload-or-pointer — spill oversize payloads
    * to a pointer, then resolve via lookup join (J5) and prove
    * round-trip integrity with md5. */
  private val vpe_claim_check: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val threshold = 256
    val enveloped = docs.select(
      col("doc_id"),
      when(length(col("text")) <= threshold, col("text")).as("inline_payload"),
      when(length(col("text")) > threshold,
        concat(lit("store://documents/"), col("doc_id"))).as("url"))
    val store = docs.select(col("doc_id").as("store_id"), col("text").as("stored_text"))
    enveloped
      .join(store, enveloped("doc_id") === store("store_id"), "left")
      .select(col("doc_id"),
        col("url").isNotNull.as("spilled"),
        md5(coalesce(col("inline_payload"), col("stored_text")).cast("binary")).as("payload_md5"))
      .orderBy(col("doc_id"))
  }

  /** vpe_timetree_person: F3+G3 — tracklet start time from frame index
    * at 12.5 fps anchored at each video's first event time, bucketed
    * into the hour tree. */
  private val vpe_timetree_person: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val videoStart = ev.groupBy(col("user_id"))
      .agg(min(col("ts")).as("video_start"), min(col("event_id")).as("first_frame"))
    val tr = Tracking.trackletSummaries(Tracking.detectionsFromEvents(ev))
      .withColumn("user_id", expr("CAST(substr(video_id, 2) AS BIGINT)"))
    tr.join(videoStart, Seq("user_id"))
      .withColumn("start_ts", Tracking.trackletStartTime(
        col("video_start"), col("start_frame") - col("first_frame")))
      .select(col("tracklet_id"),
        year(col("start_ts")).as("y"), month(col("start_ts")).as("m"),
        dayofmonth(col("start_ts")).as("day"), hour(col("start_ts")).as("h"))
      .orderBy(col("tracklet_id"))
  }

  /** vpe_plan_pipeline: the control-plane compiler executing the full
    * TRACK_ATTRRECOG_REID DAG (SURVEY §2.12) — routing columns (P1),
    * multicast, markExecuted (O2) and plan combine on the join (U3),
    * observed at the save sinks. */
  private val vpe_plan_pipeline: Q = (s, d) => {
    // observe() = the reference's per-batch bookkeeping (SURVEY A5):
    // save counts flow to QueryExecutionListeners on the action's own
    // job. Attached ABOVE the presentation sort on purpose: a
    // CollectMetrics below a global sort gets re-executed by the range
    // partitioner's sampling pass and reports doubled counts.
    graft.plans.PlanCompiler.executeFullPipeline(s, d)
      .orderBy(col("tracklet_id"), col("payload_type"))
      .observe("graft_pipeline",
        count(lit(1)).as("n_saved"),
        approx_count_distinct(col("payload_type")).as("n_sinks"))
  }

  /** vpe_multimodal_decode: batched mapPartitions decode of opaque
    * binary payloads (stub codec, real plumbing — SURVEY O11/X2). */
  private val vpe_multimodal_decode: Q = (s, d) => {
    val withBlob = Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    graft.operators.Multimodal.decodeMeta(withBlob, "payload")
      .select(col("doc_id"), col("meta.width").as("width"),
        col("meta.height").as("height"), col("meta.channels").as("channels"),
        col("meta.format").as("format"))
      .orderBy(col("doc_id"))
  }

  /** vpe_killlist: the TERM_SIG cancellation filter (SURVEY P3/J4/W8,
    * `vpe/ctrl/TaskController.java:36-88`): tasks that signalled an
    * error become the kill list; their remaining records are dropped by
    * a broadcast anti-join before processing. */
  private val vpe_killlist: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val killList = ev.filter(col("event_type") === "error")
      .select(col("user_id")).distinct()
    ev.join(broadcast(killList), Seq("user_id"), "left_anti")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_survivors"),
        countDistinct(col("user_id")).as("n_tasks"))
      .orderBy(col("event_type"))
  }

  /** vpe_json_envelope: F10 wire-format round-trip — parse the props
    * JSON payload (from_json) and re-serialize a record envelope
    * (to_json), the Gson analog of Tracklet/Attributes JSON I/O. */
  private val vpe_json_envelope: Q = (s, d) => {
    val ev = Tables.events(s, d).filter(col("event_id") < 1000)
    ev.select(
      col("event_id"),
      from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT"))
        .getField("k").as("prop_k"),
      to_json(struct(col("event_id"), col("event_type"))).as("envelope_json"))
      .orderBy(col("event_id"))
  }

  /** vpe_fragments: S6 video cutting — frames re-batched into ≤1000
    * frame fragments per video. */
  private val vpe_fragments: Q = (s, d) => {
    val det = Tracking.detectionsFromEvents(Tables.events(s, d))
    graft.operators.Multimodal.fragmentFrames(det, "video_id", "frame_idx", 1000)
      .orderBy(col("video_id"), col("fragment_id"))
  }

  /** vpe_attr_named: F8 — the fixed 128-entry projection from an FC8
    * score vector to named attribute columns (AttributeNames), spot-
    * checked on three names plus a full-vector checksum. */
  private val vpe_attr_named: Q = (s, d) => {
    import graft.functions.AttributeNames
    val tr = Tracking.trackletSummaries(
      Tracking.detectionsFromEvents(Tables.events(s, d)))
      .withColumn("attrs",
        AttributeOps.fakeAttributeVector(col("start_frame"), AttributeNames.size))
    val named = AttributeNames.attrStruct(col("attrs"))
    def pick(n: String) = named(AttributeNames.NAMES.indexOf(n))
    tr.select(
      col("tracklet_id"),
      round(pick("gender_male"), 4).as("gender_male"),
      round(pick("age_30"), 4).as("age_30"),
      round(pick("upper_black"), 4).as("upper_black"),
      round(aggregate(col("attrs"), lit(0.0), (acc, x) => acc + x), 4).as("attr_sum"))
      .orderBy(col("tracklet_id"))
  }

  // Staged GraphStore/TrackletStore per sf dir for the REID_ONLY
  // command path (rebuilt once per JVM: the stores live under tmp and
  // must not accrete appends across Verify/Bench re-runs).
  private val reidOnlyStaged =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def stageReidOnly(s: SparkSession, d: String): String =
    reidOnlyStaged.computeIfAbsent(d, dir => {
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_reidonly_" + Integer.toHexString(dir.hashCode)).toString
      val f = new java.io.File(base)
      if (f.exists()) org.apache.commons.io.FileUtils.deleteDirectory(f)
      val det = Tracking.detectionsFromEvents(Tables.events(s, dir))
      val tr = Tracking.trackletSummaries(det)
      val graph = new graft.storage.GraphStore(s, s"$base/graph")
      graph.upsertPersons(tr.select(col("tracklet_id").as("id"),
        AttributeOps.fakeScore(col("start_frame"), 0).as("attr0")))
      // stage the two probe tasks' box rows (G4 path -> S7 read target)
      val probeIds = tr.select(col("tracklet_id")).orderBy(col("tracklet_id"))
        .limit(2).collect().map(_.getString(0)).toSeq
      val store = new graft.storage.TrackletStore(s, s"$base/store")
      val probeTr = tr.filter(col("tracklet_id").isin(probeIds: _*))
        .select(col("video_id"), col("obj_key"), col("tracklet_id"))
      store.save(det
        .join(probeTr, Seq("video_id", "obj_key"))
        .select(col("tracklet_id").as("task_id"),
          col("frame_idx"), col("x"), col("y")))
      base
    })

  /** vpe_reid_only: the REID_ONLY command (SURVEY §2.12, reference
    * `MessageHandlingApp.java:303-338`) — attributes front-loaded from
    * the graph store, probe tracklets resolved from tracklet storage,
    * gallery ranked by attribute distance. Exercises the REAL storage
    * round-trip (GraphStore merge + TrackletStore partitioned read),
    * not a relational rephrase. */
  private val vpe_reid_only: Q = (s, d) => {
    val base = stageReidOnly(s, d)
    val graph = new graft.storage.GraphStore(s, s"$base/graph")
    val store = new graft.storage.TrackletStore(s, s"$base/store")
    val probeIds = graph.readPersons().select(col("id")).orderBy(col("id"))
      .limit(2).collect().map(_.getString(0)).toSeq
    graft.plans.PlanCompiler.executeReidOnly(s, graph, store, probeIds, "attr0")
      .filter(col("rank") <= 10)
      .orderBy(col("probe_id"), col("rank"))
  }

  /** vpe_partition_prune: partition pruning at rest (SURVEY K3 layout —
    * the reference stores tracklets under per-task/video directories so
    * a retrieval touches one dir, `HadoopHelper.java:232-286`). The
    * detection stream is stored partitioned by event-time day
    * (PartitionedStore.eventsByDay); this 3-day query's filter becomes
    * a PartitionFilter, so the scan lists and reads 3 of ~30 day
    * directories — the other 90% of the table is never opened.
    * PlanAuditSpec asserts the pruning on the physical plan (non-empty
    * PartitionFilters, numFiles ≤ days queried). */
  private val vpe_partition_prune: Q = (s, d) => {
    graft.storage.PartitionedStore.readEventsByDay(s, d)
      .filter(col("day") >= 20240110 && col("day") <= 20240112)
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
      .select(col("day").cast("long").as("day"), col("event_type"),
        col("n"), col("v"))
      .orderBy(col("day"), col("event_type"))
  }

  /** vpe_zorder_box: MULTI-dimensional pruning via the Z-order layout
    * ([[graft.storage.ZOrderStore]]) — the scale lever one-dimensional
    * partitioning can't give. The 2-D box (users 4–11 × Jan 7–14)
    * maps to 8 Z-prefixes of a ~240-directory table; the `zp IN`
    * filter lands as a PartitionFilter so the scan reads ~3% of the
    * files for a query that a day-partitioned table would answer with
    * 27% (8/30 days, ignoring the user bound entirely) and an
    * unpartitioned table with 100%. The residual exact box predicate
    * keeps the result independent of bucket geometry — the oracle is a
    * plain box filter on the raw table, so the layout round-trip loses
    * nothing. PlanAuditSpec asserts the file-level pruning. */
  private val vpe_zorder_box: Q = (s, d) => {
    val zps = graft.storage.ZOrderStore.boxPartitions(4, 11, 7, 14)
    graft.storage.ZOrderStore.readEventsByZ(s, d)
      .filter(col("zp").isInCollection(zps) &&
        col("user_id").between(4, 11) &&
        dayofmonth(col("ts")).between(7, 14))
      .groupBy(dayofmonth(col("ts")).cast("long").as("dom"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
      .orderBy(col("dom"), col("event_type"))
  }

  /** pipeline_compact: small-file compaction end-to-end (the
    * OPTIMIZE/maintenance layout op, [[graft.storage.PartitionedStore
    * .compact]]). The events table is first deliberately fragmented
    * into 64 shuffled files (what an over-parallel writer or streaming
    * sink leaves behind), then compacted to 4 range-partitioned,
    * within-file-sorted files. The query reads THROUGH the compacted
    * layout and aggregates; the oracle is the same aggregate on the
    * raw table — compaction must be invisible to results. The file
    * counts and the sortedness are asserted in PlanAuditSpec (data
    * properties, not plan prints). Both layouts build once through the
    * versioned cache. */
  private[graft] def compactedEventsDir(s: SparkSession, d: String): String = {
    val frag = graft.storage.PartitionedStore.cached(d, "events_fragmented") {
      path =>
        graft.Tables.events(s, d)
          // shuffle by a non-time key: fragments interleave event time,
          // the worst case for row-group stats before compaction
          .repartition(64, col("event_id"))
          .write.mode("overwrite").parquet(path)
    }
    graft.storage.PartitionedStore.cached(d, "events_compacted") { path =>
      graft.storage.PartitionedStore.compact(
        s.read.parquet(frag), path, targetFiles = 4, sortCols = Seq("ts", "event_id"))
    }
  }

  private val pipeline_compact: Q = (s, d) => {
    s.read.parquet(compactedEventsDir(s, d))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("v"),
        sum(col("event_id")).as("id_sum"))
      .orderBy(col("event_type"))
  }

  /** vpe_routed_topic: the routing-pushdown rule end-to-end (SURVEY §4,
    * reference topic-subscription `Stream.java:72-76`). Tracklets are
    * multicast-materialized into the port-partitioned RoutedStore with
    * PER-RECORD destinations (every record to tracklet-save, even
    * n_boxes additionally to attr-recog, n_boxes divisible by 3 to
    * reid); the consumer filter is the ROUTING predicate
    * `array_contains(dest_ports,'reid')` — no mention of the partition
    * column — and [[graft.plans.RoutingPushdown]] rewrites it to
    * `port = 'reid'` partition selection, so the scan reads only the
    * reid topic directory. PlanAuditSpec asserts the rewrite and the
    * file-level pruning; the oracle checks the routed rows. */
  /** The routed-tracklets fixture (port-partitioned multicast of the
    * tracklet summaries, built once per sfDir through the versioned
    * layout cache) — shared by the batch pushdown query, the streaming
    * subscription query, and PlanAuditSpec's listing audits. */
  def routedTrackletsDir(s: SparkSession, d: String): String =
    graft.storage.PartitionedStore.cached(d, "routed_tracklets") { p =>
      val tr = Tracking.trackletSummaries(
        Tracking.detectionsFromEvents(Tables.events(s, d)))
      graft.storage.RoutedStore.write(
        tr.withColumn("dest_ports", array_compact(array(
          lit("tracklet-save"),
          when(col("n_boxes") % 2 === 0, lit("attr-recog")),
          when(col("n_boxes") % 3 === 0, lit("reid"))))),
        p)
    }

  private val vpe_routed_topic: Q = (s, d) => {
    graft.plans.RoutingPushdown.install(s)
    graft.storage.RoutedStore.read(s, routedTrackletsDir(s, d))
      .filter(array_contains(col("dest_ports"), "reid"))
      .groupBy(col("video_id"))
      .agg(count(lit(1)).as("n"), sum(col("n_boxes")).cast("long").as("boxes"))
      .orderBy(col("video_id"))
  }

  /** stream_routed_topic: the STREAMING half of topic subscription
    * (SURVEY §4 / S1-K1 — the file-stream analog of a Kafka consumer's
    * topic list, reference `Stream.java:72-76`). The consumer
    * subscribes to the `reid` topic of the routed store:
    * [[graft.storage.RoutedStore.subscribe]] restricts the file
    * stream's input glob to that port's directory, so un-subscribed
    * topics are never even LISTED by the source (PlanAuditSpec reads
    * the checkpoint source log to prove it). The oracle is the same
    * row set as vpe_routed_topic — subscription ≡ routing filter, the
    * multicast invariant, now proven end-to-end on the streaming
    * path. */
  private val stream_routed_topic: Q = (s, d) => {
    val sub = graft.storage.RoutedStore.subscribe(
      s, routedTrackletsDir(s, d), Seq("reid"))
    val agg = sub.groupBy(col("video_id"))
      .agg(count(lit(1)).as("n"), sum(col("n_boxes")).cast("long").as("boxes"))
    graft.streaming.StreamingOps
      .runToMemory(s, agg, "graft_stream_routed", "complete")
      .orderBy(col("video_id"))
  }

  val queries: Map[String, Q] = Map(
    "pipeline_compact" -> pipeline_compact,
    "vpe_zorder_box" -> vpe_zorder_box,
    "vpe_partition_prune" -> vpe_partition_prune,
    "vpe_routed_topic" -> vpe_routed_topic,
    "stream_routed_topic" -> stream_routed_topic,
    "vpe_reid_only" -> vpe_reid_only,
    "vpe_attr_named" -> vpe_attr_named,
    "vpe_fragments" -> vpe_fragments,
    "vpe_killlist" -> vpe_killlist,
    "vpe_json_envelope" -> vpe_json_envelope,
    "vpe_plan_pipeline" -> vpe_plan_pipeline,
    "vpe_multimodal_decode" -> vpe_multimodal_decode,
    "vpe_tracklets" -> vpe_tracklets,
    "vpe_sample_even" -> vpe_sample_even,
    "vpe_attr_mean" -> vpe_attr_mean,
    "vpe_attr_mean_full" -> vpe_attr_mean_full,
    "vpe_reid_join" -> vpe_reid_join,
    "vpe_reid_rank" -> vpe_reid_rank,
    "vpe_similar_topk" -> vpe_similar_topk,
    "vpe_routing" -> vpe_routing,
    "vpe_claim_check" -> vpe_claim_check,
    "vpe_timetree_person" -> vpe_timetree_person)

  private val detectionsSql =
    """SELECT 'v' || CAST(user_id AS VARCHAR) AS video_id,
      |       event_type AS obj_key, event_id AS frame_idx
      |FROM events"""
      .stripMargin

  private val trackletsSql =
    s"""SELECT video_id, obj_key, start_frame, end_frame, n_boxes,
       |  CAST(row_number() OVER (PARTITION BY video_id ORDER BY start_frame) - 1 AS INT) AS serial,
       |  count(*) OVER (PARTITION BY video_id) AS num_tracklets
       |FROM (
       |  SELECT video_id, obj_key, min(frame_idx) AS start_frame,
       |         max(frame_idx) AS end_frame, count(*) AS n_boxes
       |  FROM ($detectionsSql) det
       |  GROUP BY video_id, obj_key) g"""
      .stripMargin

  val oracles: Map[String, String] = Map(
    // same aggregate on the RAW table: the fragment->compact round trip
    // must be invisible to results
    "pipeline_compact" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS v,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // plain box filter on the raw table: the Z layout must be invisible
    // to results (pruning is a plan property, audited in PlanAuditSpec)
    "vpe_zorder_box" ->
      """SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) AS dom, event_type,
        |  count(*) AS n, round(sum(value), 2) AS v
        |FROM events
        |WHERE user_id BETWEEN 4 AND 11
        |  AND EXTRACT(day FROM ts) BETWEEN 7 AND 14
        |GROUP BY 1, 2
        |ORDER BY dom, event_type""".stripMargin,
    "vpe_partition_prune" ->
      """SELECT CAST(strftime(ts, '%Y%m%d') AS BIGINT) AS day, event_type,
        |  count(*) AS n, round(sum(value), 2) AS v
        |FROM events
        |WHERE CAST(strftime(ts, '%Y%m%d') AS BIGINT) BETWEEN 20240110 AND 20240112
        |GROUP BY 1, 2
        |ORDER BY day, event_type""".stripMargin,
    "vpe_routed_topic" ->
      s"""SELECT video_id, count(*) AS n, CAST(sum(n_boxes) AS BIGINT) AS boxes
         |FROM ($trackletsSql) t
         |WHERE n_boxes % 3 = 0
         |GROUP BY video_id
         |ORDER BY video_id""".stripMargin,
    // subscription ≡ routing filter (the multicast invariant): the
    // streaming subscriber to the reid topic must land on the exact
    // same table as the batch routing-filter consumer
    "stream_routed_topic" ->
      s"""SELECT video_id, count(*) AS n, CAST(sum(n_boxes) AS BIGINT) AS boxes
         |FROM ($trackletsSql) t
         |WHERE n_boxes % 3 = 0
         |GROUP BY video_id
         |ORDER BY video_id""".stripMargin,
    "vpe_reid_only" ->
      s"""WITH tr AS (
         |  SELECT video_id || '_tarid' || CAST(serial AS VARCHAR) AS id,
         |    start_frame, n_boxes
         |  FROM ($trackletsSql) t),
         |persons AS (
         |  SELECT id, ((start_frame * 31 + 7) % 997) / 997.0 AS attr0, n_boxes
         |  FROM tr),
         |probes AS (SELECT id, attr0, n_boxes FROM persons ORDER BY id LIMIT 2),
         |scored AS (
         |  SELECT p.id AS probe_id, c.id AS candidate_id,
         |    CAST(floor(abs(p.attr0 - c.attr0) * 10000) AS BIGINT) AS score_bp,
         |    p.n_boxes AS n_boxes_stored
         |  FROM probes p JOIN persons c ON c.id <> p.id),
         |ranked AS (
         |  SELECT probe_id, candidate_id, score_bp, n_boxes_stored,
         |    row_number() OVER (PARTITION BY probe_id
         |      ORDER BY score_bp ASC, candidate_id ASC) AS rank
         |  FROM scored)
         |SELECT probe_id, rank, candidate_id, score_bp, n_boxes_stored
         |FROM ranked WHERE rank <= 10
         |ORDER BY probe_id, rank""".stripMargin,
    "vpe_attr_named" -> {
      import graft.functions.AttributeNames
      def scoreSql(dim: Int) =
        s"((start_frame * ${31 + dim * 2} + ${7 + dim}) % 997) / 997.0"
      def idx(n: String) = AttributeNames.NAMES.indexOf(n)
      s"""WITH tr AS (
         |  SELECT video_id || '_tarid' || CAST(serial AS VARCHAR) AS tracklet_id,
         |    start_frame
         |  FROM ($trackletsSql) t)
         |SELECT tracklet_id,
         |  round(${scoreSql(idx("gender_male"))}, 4) AS gender_male,
         |  round(${scoreSql(idx("age_30"))}, 4) AS age_30,
         |  round(${scoreSql(idx("upper_black"))}, 4) AS upper_black,
         |  round(list_sum(list_transform(range(0, ${AttributeNames.size}),
         |    d -> ((start_frame * (31 + d * 2) + (7 + d)) % 997) / 997.0)), 4) AS attr_sum
         |FROM tr
         |ORDER BY tracklet_id""".stripMargin
    },
    "vpe_fragments" ->
      s"""SELECT video_id, frame_idx // 1000 AS fragment_id,
         |  count(*) AS n_frames, min(frame_idx) AS first_frame,
         |  max(frame_idx) AS last_frame
         |FROM ($detectionsSql) det
         |GROUP BY video_id, frame_idx // 1000
         |ORDER BY video_id, fragment_id""".stripMargin,
    "vpe_killlist" ->
      """SELECT event_type, count(*) AS n_survivors,
        |  count(DISTINCT user_id) AS n_tasks
        |FROM events
        |WHERE user_id NOT IN (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "vpe_json_envelope" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS INT) AS prop_k,
        |  to_json({'event_id': event_id, 'event_type': event_type}) AS envelope_json
        |FROM events
        |WHERE event_id < 1000
        |ORDER BY event_id""".stripMargin,
    "vpe_plan_pipeline" ->
      s"""WITH tr AS (
         |  SELECT video_id || '_tarid' || CAST(serial AS VARCHAR) AS tracklet_id
         |  FROM ($trackletsSql) t)
         |SELECT tracklet_id, payload_type, executed_path FROM (
         |  SELECT tracklet_id, 'tracklet' AS payload_type, 'tracking' AS executed_path FROM tr
         |  UNION ALL
         |  SELECT tracklet_id, 'attributes', 'attr-recog,tracking' FROM tr
         |  UNION ALL
         |  SELECT tracklet_id, 'idrank', 'attr-recog,reid,tracking' FROM tr) u
         |ORDER BY tracklet_id, payload_type""".stripMargin,
    "vpe_multimodal_decode" ->
      """SELECT doc_id,
        |  CASE WHEN length(text) = 0 THEN 0
        |       ELSE 16 * ((ascii(substr(text, 1, 1)) % 64) + 1) END AS width,
        |  CASE WHEN length(text) = 0 THEN 0
        |       WHEN length(text) = 1 THEN 16
        |       ELSE 16 * ((ascii(substr(text, 2, 1)) % 64) + 1) END AS height,
        |  CASE WHEN length(text) = 0 THEN 0 ELSE 3 END AS channels,
        |  CASE WHEN length(text) = 0 THEN 'empty' ELSE 'fakeimg' END AS format
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "vpe_tracklets" ->
      s"""SELECT video_id, serial,
         |  video_id || '_tarid' || CAST(serial AS VARCHAR) AS tracklet_id,
         |  start_frame, end_frame, n_boxes, num_tracklets
         |FROM ($trackletsSql) t
         |ORDER BY video_id, serial""".stripMargin,
    "vpe_sample_even" ->
      s"""WITH tr AS (SELECT video_id || '_tarid' || CAST(serial AS VARCHAR) AS tracklet_id,
         |    n_boxes, CAST(n_boxes AS BIGINT) AS n FROM ($trackletsSql) t),
         |params AS (
         |  SELECT tracklet_id, n_boxes, n,
         |    n // 6 AS interval,
         |    (n - 4 * (n // 6)) // 2 AS start
         |  FROM tr),
         |calc AS (
         |  SELECT tracklet_id, n_boxes, n, interval,
         |    CASE WHEN n <= 5 THEN NULL ELSE start % interval END AS first_mod
         |  FROM params)
         |SELECT tracklet_id, n_boxes,
         |  CASE WHEN n <= 5 THEN n
         |       ELSE (n - 1 - first_mod) // interval + 1 END AS n_kept,
         |  CASE WHEN n <= 5 THEN 0 ELSE first_mod END AS first_kept,
         |  CASE WHEN n <= 5 THEN n - 1
         |       ELSE first_mod + ((n - 1 - first_mod) // interval) * interval END AS last_kept
         |FROM calc
         |ORDER BY tracklet_id""".stripMargin,
    "vpe_attr_mean" ->
      s"""SELECT video_id, obj_key,
         |  round(avg(((frame_idx * 31 + 7) % 997) / 997.0), 4) AS mean_a0,
         |  round(avg(((frame_idx * 33 + 8) % 997) / 997.0), 4) AS mean_a1,
         |  round(avg(((frame_idx * 35 + 9) % 997) / 997.0), 4) AS mean_a2,
         |  round(avg(((frame_idx * 37 + 10) % 997) / 997.0), 4) AS mean_a3,
         |  count(*) AS n_samples
         |FROM ($detectionsSql) det
         |GROUP BY video_id, obj_key
         |ORDER BY video_id, obj_key""".stripMargin,
    "vpe_attr_mean_full" -> {
      val dims = graft.functions.AttributeNames.size
      def avgSql(dim: Int) =
        s"round(avg(((frame_idx * ${31 + dim * 2} + ${7 + dim}) % 997) / 997.0), 4)"
      s"""SELECT video_id, obj_key,
         |  ${avgSql(0)} AS mean_first,
         |  ${avgSql(dims - 1)} AS mean_last,
         |  round(list_sum([${(0 until dims).map(avgSql).mkString(", ")}]), 4) AS mean_sum,
         |  count(*) AS n_samples
         |FROM ($detectionsSql) det
         |GROUP BY video_id, obj_key
         |ORDER BY video_id, obj_key""".stripMargin
    },
    "vpe_reid_join" ->
      s"""WITH tr AS (
         |  SELECT video_id, obj_key,
         |    video_id || '_tarid' || CAST(serial AS VARCHAR) AS tracklet_id, n_boxes
         |  FROM ($trackletsSql) t),
         |am AS (
         |  SELECT video_id, obj_key,
         |    round(avg(((frame_idx * 31 + 7) % 997) / 997.0), 4) AS attr0,
         |    count(*) AS n_samples
         |  FROM ($detectionsSql) det
         |  WHERE obj_key <> 'error'
         |  GROUP BY video_id, obj_key)
         |SELECT coalesce(tr.video_id, am.video_id) AS video_id,
         |  coalesce(tr.obj_key, am.obj_key) AS obj_key,
         |  tr.tracklet_id, tr.n_boxes, am.attr0, am.n_samples,
         |  CASE WHEN tr.tracklet_id IS NOT NULL AND am.attr0 IS NOT NULL THEN 'matched'
         |       WHEN tr.tracklet_id IS NOT NULL THEN 'tracklet_only'
         |       ELSE 'attr_only' END AS presence
         |FROM tr FULL OUTER JOIN am
         |  ON tr.video_id = am.video_id AND tr.obj_key = am.obj_key
         |ORDER BY video_id, obj_key""".stripMargin,
    "vpe_reid_rank" ->
      """WITH q AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |pairs AS (
        |  SELECT p.vec_id AS probe_id, c.vec_id AS candidate_id,
        |    CAST(list_sum(list_transform(list_zip(p.qv, c.qv),
        |      z -> z[1] * z[2])) AS BIGINT) AS score
        |  FROM q p JOIN q c ON p.vec_id < 10 AND p.vec_id <> c.vec_id),
        |ranked AS (
        |  SELECT probe_id, candidate_id, score,
        |    row_number() OVER (PARTITION BY probe_id
        |      ORDER BY score DESC, candidate_id) AS rank
        |  FROM pairs)
        |SELECT probe_id, rank, candidate_id, score
        |FROM ranked WHERE rank <= 5
        |ORDER BY probe_id, rank""".stripMargin,
    "vpe_similar_topk" ->
      s"""WITH q AS (SELECT vec_id, label, ${SimilaritySql.quantizeSql} AS qv
         |  FROM embeddings),
         |${SimilaritySql.bandedCandCtes("q", Seq("label"))},
         |pairs AS (
         |  SELECT cand.id_a, cand.id_b,
         |    CAST(list_sum(list_transform(list_zip(qa.qv, qb.qv),
         |      z -> z[1] * z[2])) AS BIGINT) AS score
         |  FROM cand
         |  JOIN q qa ON qa.vec_id = cand.id_a
         |  JOIN q qb ON qb.vec_id = cand.id_b),
         |directed AS (
         |  SELECT id_a AS src, id_b AS dst, score FROM pairs
         |  UNION ALL SELECT id_b, id_a, score FROM pairs),
         |ranked AS (
         |  SELECT src, dst, score,
         |    row_number() OVER (PARTITION BY src ORDER BY score DESC, dst) AS rank
         |  FROM directed)
         |SELECT src, rank, dst, score FROM ranked WHERE rank <= 3
         |ORDER BY src, rank""".stripMargin,
    "vpe_routing" ->
      """WITH env AS (
        |  SELECT event_id,
        |    CASE WHEN event_type = 'click' THEN ['attr-recog', 'save']
        |         WHEN event_type = 'purchase' THEN ['attr-recog', 'reid', 'save']
        |         WHEN event_type = 'view' THEN ['save']
        |         ELSE ['monitor'] END AS dest_ports
        |  FROM events),
        |ports AS (SELECT unnest(['attr-recog', 'reid', 'save', 'monitor']) AS port)
        |SELECT port, count(env.event_id) AS n_records
        |FROM ports LEFT JOIN env ON list_contains(env.dest_ports, ports.port)
        |GROUP BY port
        |ORDER BY port""".stripMargin,
    "vpe_claim_check" ->
      """SELECT doc_id, length(text) > 256 AS spilled, md5(text) AS payload_md5
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "vpe_timetree_person" ->
      s"""WITH vs AS (
         |  SELECT user_id, min(ts) AS video_start, min(event_id) AS first_frame
         |  FROM events GROUP BY user_id),
         |tr AS (
         |  SELECT CAST(substr(video_id, 2) AS BIGINT) AS user_id,
         |    video_id || '_tarid' || CAST(serial AS VARCHAR) AS tracklet_id,
         |    start_frame
         |  FROM ($trackletsSql) t)
         |SELECT tr.tracklet_id,
         |  EXTRACT(year FROM start_ts) AS y, EXTRACT(month FROM start_ts) AS m,
         |  EXTRACT(day FROM start_ts) AS day, EXTRACT(hour FROM start_ts) AS h
         |FROM (
         |  SELECT tr.tracklet_id,
         |    make_timestamp((CAST(floor(epoch(vs.video_start)) AS BIGINT)
         |      + ((tr.start_frame - vs.first_frame) * 2 // 25)) * 1000000) AS start_ts
         |  FROM tr JOIN vs ON tr.user_id = vs.user_id) tr
         |ORDER BY tracklet_id""".stripMargin)
}
