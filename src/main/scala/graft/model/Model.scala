package graft.model

/** Core data model, re-expressed as Spark-SQL-friendly case classes.
  *
  * Mirrors the reference's fixed-by-class schemas (SURVEY.md §1.2):
  *  - Tracklet / BoundingBox: reference
  *    `alg/pedestrian/tracking/Tracklet.java:42-269`
  *  - Attributes: named float scores (one per entry of the reference
  *    ATTR_LIST — 125 names; see `AttributeNames.size`),
  *    `alg/pedestrian/attr/Attributes.java:36-419` — modeled here as
  *    `Array[Float]` + the name table in [[graft.functions.AttributeNames]]
  *    (array form keeps vector math cheap; the named-struct projection is
  *    a fixed `select`).
  *  - Feature1024: `alg/pedestrian/reid/Feature1024.java:27-32`.
  *  - TaskEnvelope: the routing envelope, `vpe/ctrl/TaskData.java:33-142`
  *    — `destPorts` drives per-record multicast (SURVEY P1), `executed`
  *    mirrors ExecutionPlan.markExecuted (TaskData.java:332-337).
  *  - TrackletOrUrl: claim-check union,
  *    `vpe/alg/pedestrian/tracking/TrackletOrURL.java:34-82`.
  */
final case class BoundingBox(
    x: Int, y: Int, width: Int, height: Int,
    patch: Option[Array[Byte]])

final case class Tracklet(
    videoId: String,
    serialNumber: Int,
    numTracklets: Int,
    startFrameIndex: Int,
    locationSequence: Seq[BoundingBox]) {
  /** Reference id format: `videoID + "_tarid" + serialNumber`
    * (Tracklet.java:136-138). */
  def id: String = s"${videoId}_tarid$serialNumber"
}

final case class AttributeVector(values: Array[Float])

final case class Feature(values: Array[Float]) {
  require(values != null)
}

final case class TaskEnvelope(
    taskId: String,
    destPorts: Seq[String],
    executed: Seq[String],
    payloadUrl: Option[String])

/** Either-payload: inline value or storage pointer (claim check, O3). */
final case class TrackletOrUrl(
    tracklet: Option[Tracklet],
    url: Option[String])

/** Graph surface rows (SURVEY §2.11): persons + similar tables replace
  * Neo4j Person nodes / Similar edges. */
final case class PersonRecord(
    id: String,
    path: String,
    startTime: Option[java.sql.Timestamp],
    attrs: Array[Float])

final case class SimilarEdge(src: String, dst: String, similarity: Float)
