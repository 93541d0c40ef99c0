package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{BoundingBox, Tracklet}

/** Typed (Dataset[Tracklet]) view of the tracking stage — the
  * compile-time-checked API surface for users who want case-class rows
  * (SURVEY §1.2: `Dataset[T]` with case classes mirroring
  * Tracklet/Attributes for the typed API, DataFrame for routing).
  *
  * The relational form (Tracking.tracklets) and this typed form share
  * the same plan shape; `.as[Tracklet]` only adds the encoder.
  */
object TypedPipeline {

  /** Detections → Dataset[Tracklet] with reference semantics: serials
    * chronological per video, numTracklets stamped, location sequence
    * ordered by frame. Patches start empty (the tracker stub carries
    * geometry only). */
  def trackletsTyped(spark: SparkSession, detections: org.apache.spark.sql.DataFrame): Dataset[Tracklet] = {
    import spark.implicits._
    val withSeq = Tracking.tracklets(detections)
    val all = org.apache.spark.sql.expressions.Window.partitionBy(col("video_id"))
    withSeq
      .withColumn("num_tracklets", count(lit(1)).over(all).cast("int"))
      .select(
        col("video_id").as("videoId"),
        col("serial").as("serialNumber"),
        col("num_tracklets").as("numTracklets"),
        col("start_frame").cast("int").as("startFrameIndex"),
        transform(col("location_sequence"), b => struct(
          b.getField("x").as("x"),
          b.getField("y").as("y"),
          b.getField("width").as("width"),
          b.getField("height").as("height"),
          lit(null).cast("binary").as("patch"))).as("locationSequence"))
      .as[Tracklet]
  }

  /** Typed even-interval sampling (A2) over the case-class form. */
  def sampleTyped(ds: Dataset[Tracklet], numSamples: Int): Dataset[Tracklet] = {
    import ds.sparkSession.implicits._
    ds.map { t =>
      val kept = Sampling.evenSampleIndices(t.locationSequence.size, numSamples).toSet
      t.copy(locationSequence = t.locationSequence.zipWithIndex.map {
        case (b, i) => if (kept(i)) b else b.copy(patch = None)
      })
    }
  }
}
