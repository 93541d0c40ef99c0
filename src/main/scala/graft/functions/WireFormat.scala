package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's JSON wire format (SURVEY §1.2 / F10): Gson with
  * `@SerializedName` field naming defines how tracklets are stored in
  * HDFS `info.txt` and shipped to external recognizers
  * (`Tracklet.java:56-107`, `HadoopHelper.java:236-252`). A user
  * switching from the reference can read/write the same JSON with
  * these helpers.
  *
  * Wire names (Tracklet.java): `id.video-url`, `id.serial-number`,
  * `tracklet-number`, `run-frame-index`, `bounding-boxes[].{x,y,width,
  * height}`. Patch pixel data is STRIPPED on serialization, exactly
  * like the reference's custom serializer (HadoopHelper.java:236-252
  * excludes patchData from info.txt).
  */
object WireFormat {

  val boundingBoxWireSchema: StructType = StructType(Seq(
    StructField("x", IntegerType),
    StructField("y", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  val trackletWireSchema: StructType = StructType(Seq(
    StructField("id", StructType(Seq(
      StructField("video-url", StringType),
      StructField("serial-number", IntegerType)))),
    StructField("tracklet-number", IntegerType),
    StructField("run-frame-index", IntegerType),
    StructField("bounding-boxes", ArrayType(boundingBoxWireSchema))))

  /** Serialize tracklet columns to the reference wire JSON. `boxes`
    * must be array<struct> with x/y/width/height fields (extra fields,
    * e.g. patch, are stripped — reference behavior). */
  def toWireJson(videoId: Column, serial: Column, numTracklets: Column,
                 startFrame: Column, boxes: Column): Column =
    to_json(struct(
      struct(
        videoId.as("video-url"),
        serial.cast("int").as("serial-number")).as("id"),
      numTracklets.cast("int").as("tracklet-number"),
      startFrame.cast("int").as("run-frame-index"),
      transform(boxes, b => struct(
        b.getField("x").cast("int").as("x"),
        b.getField("y").cast("int").as("y"),
        b.getField("width").cast("int").as("width"),
        b.getField("height").cast("int").as("height"))).as("bounding-boxes")))

  /** Parse reference wire JSON back into a tracklet struct. */
  def fromWireJson(json: Column): Column =
    from_json(json, trackletWireSchema)

  /** Reference tracklet id string (`Tracklet.Identifier.toString`:
    * `videoID + "_tarid" + serialNumber`). */
  def trackletId(videoId: Column, serial: Column): Column =
    concat(videoId, lit("_tarid"), serial.cast("string"))
}
