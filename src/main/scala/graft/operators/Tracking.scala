package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The tracking stage re-expressed relationally (SURVEY X1/T3).
  *
  * The reference's `Tracker` is a one→many black box
  * (`alg/pedestrian/tracking/Tracker.java:32-41`: video → 0..n
  * tracklets) whose real implementation is JNI; its debug twin emits
  * synthetic tracklets (`vpe/debug/FakePedestrianTracker.java:28-79`).
  * Here the deterministic equivalent is a *grouping* of per-frame
  * detections into tracklets plus chronological serial-number
  * assignment (`BasicTracker.java:131-134`: serials 0..n-1 in order,
  * `numTracklets` stamped on each).
  *
  * Scale notes: detections→tracklets is one shuffle on the tracklet
  * key; serial assignment is a window over `video_id` — partition-local
  * after the shuffle, no extra exchange (the window reuses the
  * hash-partitioning when keyed on a prefix of the group key).
  */
object Tracking {

  /** Deterministic detection stream derived from the `events` table:
    * one event = one bounding-box observation.
    *   video_id = 'v<user_id>'  (one camera stream per user)
    *   object key = event_type  (one tracked object per type per video)
    *   frame index = event_id   (globally increasing, unique)
    * Box geometry is integer-derived from ids (deterministic, engine-
    * portable). */
  def detectionsFromEvents(events: DataFrame): DataFrame =
    events.select(
      concat(lit("v"), col("user_id").cast("string")).as("video_id"),
      col("event_type").as("obj_key"),
      col("event_id").as("frame_idx"),
      (col("event_id") % 1920).cast("int").as("x"),
      ((col("event_id") * 7) % 1080).cast("int").as("y"),
      lit(64).as("width"),
      lit(128).as("height"))

  /** Group detections into tracklet summaries with reference serial
    * semantics: serial = rank of start frame within the video (0-based),
    * num_tracklets stamped per video. */
  def trackletSummaries(detections: DataFrame): DataFrame = {
    val grouped = detections
      .groupBy(col("video_id"), col("obj_key"))
      .agg(
        min("frame_idx").as("start_frame"),
        max("frame_idx").as("end_frame"),
        count(lit(1)).as("n_boxes"))
    val byStart = Window.partitionBy(col("video_id")).orderBy(col("start_frame"))
    val all = Window.partitionBy(col("video_id"))
    grouped
      .withColumn("serial", (row_number().over(byStart) - 1).cast("int"))
      .withColumn("num_tracklets", count(lit(1)).over(all))
      .withColumn("tracklet_id",
        concat(col("video_id"), lit("_tarid"), col("serial").cast("string")))
  }

  /** Full tracklet rows including the location sequence (array of bbox
    * structs ordered by frame), for the typed/streaming paths. */
  def tracklets(detections: DataFrame): DataFrame = {
    val seqs = detections
      .groupBy(col("video_id"), col("obj_key"))
      .agg(
        min("frame_idx").as("start_frame"),
        sort_array(collect_list(struct(
          col("frame_idx"), col("x"), col("y"),
          col("width"), col("height")))).as("location_sequence"))
    val byStart = Window.partitionBy(col("video_id")).orderBy(col("start_frame"))
    seqs
      .withColumn("serial", (row_number().over(byStart) - 1).cast("int"))
      .withColumn("tracklet_id",
        concat(col("video_id"), lit("_tarid"), col("serial").cast("string")))
  }

  /** Tracklet start time (SURVEY F3): frame→wall-clock at 12.5 fps
    * added to the video start timestamp
    * (reference `Neo4jConnector.java:51-99`, fps 25/2). */
  def trackletStartTime(videoStartTs: Column, startFrameIdx: Column): Column =
    timestamp_seconds(unix_timestamp(videoStartTs) +
      floor((startFrameIdx * 2).cast("long") / 25).cast("long"))
}
