package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{AttributeOps, Tracking}

/** Control-plane compiler (SURVEY §2.12): the reference's
  * MessageHandlingApp builds a per-task ExecutionPlan DAG — nodes are
  * operator executions, edges are Kafka topics, and every record
  * carries `destPorts` + the remaining plan
  * (`vpe/ctrl/MessageHandlingApp.java:158-342`,
  * `vpe/ctrl/TaskData.java:162-343`).
  *
  * Spark-native form: topics become in-process Datasets; the dynamic
  * per-record multicast survives as a `dest_ports` array column
  * (records route to an operator via `array_contains` — P1), and
  * ExecutionPlan.markExecuted/combine become `array_union` on an
  * `executed` column (O2/U3). The compiler wires the fixed topology of
  * each command type; Catalyst then optimizes the whole wired plan as
  * one query — the reference's cross-app Kafka hops become exchange
  * reuse or nothing at all.
  */
object PlanCompiler {

  // port names mirror the reference streams' ports
  val TrackingPort = "tracking"
  val AttrRecogPort = "attr-recog"
  val ReIdPort = "reid"
  val TrackletSavePort = "tracklet-save"
  val AttrSavePort = "attr-save"
  val IdRankSavePort = "idrank-save"

  /** The 8 command types of MessageHandlingApp
    * (`MessageHandlingApp.java:113-125`); RT_* are unimplemented in
    * the reference too (145-148). Edges: node → downstream ports. */
  val commandTopologies: Map[String, Map[String, Seq[String]]] = Map(
    "track-only" -> Map(
      "tracking" -> Seq(TrackletSavePort)),
    "track-attrrecog" -> Map(
      "tracking" -> Seq(AttrRecogPort, TrackletSavePort),
      "attr-recog" -> Seq(AttrSavePort)),
    "track-attrrecog-reid" -> Map(
      "tracking" -> Seq(AttrRecogPort, ReIdPort, TrackletSavePort),
      "attr-recog" -> Seq(ReIdPort, AttrSavePort),
      "reid" -> Seq(IdRankSavePort)),
    "attrrecog-only" -> Map(
      "attr-recog" -> Seq(AttrSavePort)),
    "attrrecog-reid" -> Map(
      "attr-recog" -> Seq(ReIdPort, AttrSavePort),
      "reid" -> Seq(IdRankSavePort)),
    "reid-only" -> Map(
      "reid" -> Seq(IdRankSavePort)))

  /** Attach the routing envelope: dest_ports for the multicast targets,
    * executed for the plan-progress marker (TaskData.markExecuted). */
  def envelope(df: DataFrame, executedNode: String, destPorts: Seq[String],
               prevExecuted: Column = array()): DataFrame =
    df.withColumn("dest_ports", array(destPorts.map(lit): _*))
      .withColumn("executed",
        array_sort(array_union(prevExecuted, array(lit(executedNode)))))

  /** P1 port-routing filter (`Stream.java:72-76`). */
  def routeTo(df: DataFrame, port: String): DataFrame =
    df.filter(array_contains(col("dest_ports"), port))

  /** Execute the full TRACK_ATTRRECOG_REID dataflow over the events
    * table and return the save-sink contents: one row per delivered
    * record with its payload type and executed path. The three sinks
    * (K3/K5/K6) are modeled as one union'd save table tagged by port. */
  def executeFullPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val topo = commandTopologies("track-attrrecog-reid")

    // tracking stage (X1): detections -> tracklet summaries, multicast
    // to attr-recog, reid and tracklet-save (one Dataset, three consumers)
    val tracklets = Tracking.trackletSummaries(
      Tracking.detectionsFromEvents(Tables.events(spark, sfDir)))
    val trackOut = envelope(tracklets, "tracking", topo("tracking"))

    // attr-recog stage (X2/A1): consumes its port, computes the
    // per-tracklet mean attribute, multicasts onward
    val attrIn = routeTo(trackOut, AttrRecogPort)
    val attrs = attrIn
      .withColumn("attr0",
        round(AttributeOps.fakeScore(col("start_frame"), 0), 4))
    val attrOut = envelope(
      attrs.select(col("video_id"), col("obj_key"), col("tracklet_id"),
        col("attr0"), col("executed")),
      "attr-recog", topo("attr-recog"), prevExecuted = col("executed"))

    // reid stage (X3/J1/U3): tracklet leg ⋈ attr leg on the composite
    // key; executed = combine of both sides' markers
    val trackletLeg = routeTo(trackOut, ReIdPort)
      .select(col("tracklet_id"), col("n_boxes"), col("executed").as("exec_t"))
    val attrLeg = routeTo(attrOut, ReIdPort)
      .select(col("tracklet_id"), col("attr0"), col("executed").as("exec_a"))
    val reidIn = trackletLeg.join(attrLeg, "tracklet_id")
    val reidOut = envelope(
      reidIn.withColumn("rank0", (col("attr0") * 1000).cast("long"))
        .withColumn("exec_prev", array_union(col("exec_t"), col("exec_a")))
        .select(col("tracklet_id"), col("rank0"), col("exec_prev")),
      "reid", topo("reid"),
      prevExecuted = col("exec_prev")).drop("exec_prev")

    // save sinks: union of everything routed to a *-save port.
    // NOTE: the A5 observe() bookkeeping is attached by the caller
    // ABOVE any presentation sort (see PipelineQueries) — a
    // CollectMetrics below a global sort is re-executed by the range
    // partitioner's sampling pass and double-counts.
    val saved =
      routeTo(trackOut, TrackletSavePort)
        .select(col("tracklet_id"), lit("tracklet").as("payload_type"), col("executed"))
        .unionByName(routeTo(attrOut, AttrSavePort)
          .select(col("tracklet_id"), lit("attributes").as("payload_type"), col("executed")))
        .unionByName(routeTo(reidOut, IdRankSavePort)
          .select(col("tracklet_id"), lit("idrank").as("payload_type"), col("executed")))
    saved
      .select(col("tracklet_id"), col("payload_type"),
        array_join(col("executed"), ",").as("executed_path"))
  }

  /** REID_ONLY command (SURVEY §2.12, reference
    * `MessageHandlingApp.java:303-338`): no tracking/recognition runs —
    * the PedestrianInfo join is FRONT-LOADED from storage: attributes
    * from the graph store (G8) joined with stored tracklets (G4 path →
    * S7 retrieve), then ranked against the gallery. `attrCols` are the
    * attribute columns to rank on.
    *
    * Returns (probe_id, rank, candidate_id, score_bp): per probe, the
    * gallery ordered by attribute-distance ascending — the reference
    * reid's int[] rank as rows. */
  def executeReidOnly(spark: SparkSession,
                      graph: graft.storage.GraphStore,
                      store: graft.storage.TrackletStore,
                      probeIds: Seq[String],
                      attrCol: String): DataFrame = {
    val persons = graph.readPersons()
    val probes = persons.filter(col("id").isin(probeIds: _*))
      .select(col("id").as("probe_id"), col(attrCol).as("probe_attr"))
    // resolve each probe's stored tracklet (G4 path -> S7 read) to prove
    // the pointer is live; one unioned plan -> a single Spark job, and
    // a broken store path surfaces as an error instead of a silent 0
    val countsDf = probeIds.map { id =>
      store.readTask(id)
        .groupBy().agg(count(lit(1)).as("n_boxes_stored"))
        .select(lit(id).as("probe_id"), col("n_boxes_stored"))
    }.reduce(_ unionByName _)
    val gallery = persons
      .select(col("id").as("candidate_id"), col(attrCol).as("cand_attr"))
    val scored = gallery.join(broadcast(probes),
        col("probe_id") =!= col("candidate_id"))
      .select(col("probe_id"), col("candidate_id"),
        floor(abs(col("probe_attr") - col("cand_attr")) * 10000).cast("long").as("score_bp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("score_bp").asc, col("candidate_id").asc)
    val ranked = scored.withColumn("rank", row_number().over(w))
    ranked.join(broadcast(countsDf), "probe_id")
      .select(col("probe_id"), col("rank"), col("candidate_id"),
        col("score_bp"), col("n_boxes_stored"))
  }
}
