package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.WireFormat
import graft.operators.Skew

class WireSkewSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("tracklet wire JSON round-trips with reference field names, patch stripped") {
    val boxes = Seq((10, 20, 64, 128, Array[Byte](1, 2, 3)))
    val df = Seq(("CAM01_2014", 3, 12, 218))
      .toDF("video_id", "serial", "num_tracklets", "start_frame")
      .withColumn("boxes", typedLit(boxes)
        .cast("array<struct<x:int,y:int,width:int,height:int,patch:binary>>"))
    val json = df.select(WireFormat.toWireJson(
      $"video_id", $"serial", $"num_tracklets", $"start_frame", $"boxes").as("j"))
    val s = json.as[String].head()
    // reference @SerializedName wire keys present, patch data absent
    assert(s.contains("\"video-url\":\"CAM01_2014\""))
    assert(s.contains("\"serial-number\":3"))
    assert(s.contains("\"tracklet-number\":12"))
    assert(s.contains("\"run-frame-index\":218"))
    assert(s.contains("\"bounding-boxes\":[{\"x\":10,\"y\":20,\"width\":64,\"height\":128}]"))
    assert(!s.contains("patch"))

    val back = json.select(WireFormat.fromWireJson($"j").as("t"))
      .select($"t.id.`video-url`".as("v"), $"t.`run-frame-index`".as("f"),
        size($"t.`bounding-boxes`").as("nb"))
      .head()
    assert(back.getString(0) == "CAM01_2014")
    assert(back.getInt(1) == 218)
    assert(back.getInt(2) == 1)
  }

  test("wire JSON parses a reference-shaped document produced externally") {
    val gsonStyle =
      """{"id":{"video-url":"v7","serial-number":0},"tracklet-number":5,
        |"run-frame-index":42,"bounding-boxes":[{"x":1,"y":2,"width":3,"height":4}]}"""
        .stripMargin.replace("\n", "")
    val t = Seq(gsonStyle).toDF("j")
      .select(WireFormat.fromWireJson($"j").as("t"))
      .select($"t.id.`serial-number`").as[Int].head()
    assert(t == 0)
  }

  test("kafka envelope codec round-trips with per-row topic routing") {
    import graft.streaming.KafkaEdge
    val env = Seq(
      ("t1", Seq("attr-recog", "save"), Seq("tracking"), null: String, """{"n":1}"""),
      ("t2", Seq("reid"), Seq("tracking", "attr-recog"), "store://x", null: String))
      .toDF("task_id", "dest_ports", "executed", "payload_url", "payload_json")
    // route each record to the topic of its first dest port (K1)
    val encoded = KafkaEdge.encodeEnvelope(env, element_at($"dest_ports", 1))
    assert(encoded.columns.toSeq == Seq("topic", "key", "value"))
    assert(encoded.select("topic").as[String].collect().toSet == Set("attr-recog", "reid"))
    val decoded = KafkaEdge.decodeEnvelope(encoded)
      .orderBy("task_id").collect()
    assert(decoded.map(_.getAs[String]("task_id")).toSeq == Seq("t1", "t2"))
    assert(decoded(0).getAs[scala.collection.Seq[String]]("dest_ports").toSeq ==
      Seq("attr-recog", "save"))
    assert(decoded(1).getAs[String]("payload_url") == "store://x")
    assert(decoded(0).getAs[String]("payload_json") == """{"n":1}""")
  }

  test("kafka codec matches the connector's exact source/sink schemas") {
    // The spark-sql-kafka jar cannot ship in this zero-egress build
    // (not in /opt/spark/jars, not in the offline dep cache), so the
    // contract is pinned structurally instead: decodeEnvelope must
    // accept EXACTLY the record shape the connector's source emits,
    // and encodeEnvelope must emit only columns/types its sink accepts.
    import graft.streaming.KafkaEdge
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row

    // source schema per the Structured Streaming + Kafka integration
    // guide: key/value BINARY, topic STRING, partition INT, offset
    // LONG, timestamp TIMESTAMP, timestampType INT
    val kafkaSourceSchema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("topic", StringType), StructField("partition", IntegerType),
      StructField("offset", LongType), StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
    val json =
      """{"task_id":"t9","dest_ports":["save"],"executed":[],
        |"payload_url":null,"payload_json":"{\"n\":9}"}""".stripMargin.replace("\n", "")
    val records = spark.createDataFrame(
      java.util.List.of(Row("t9".getBytes("UTF-8"), json.getBytes("UTF-8"),
        "pedestrian-tracking", 0, 17L,
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 0)),
      kafkaSourceSchema)
    val decoded = KafkaEdge.decodeEnvelope(records).collect()
    assert(decoded.length == 1)
    assert(decoded(0).getAs[String]("task_id") == "t9")
    assert(decoded(0).getAs[String]("topic") == "pedestrian-tracking")
    assert(decoded(0).getAs[String]("payload_json") == """{"n":9}""")

    // sink accepts: topic STRING (optional if set via option), key
    // BINARY-or-STRING, value BINARY-or-STRING — nothing else required
    val env = Seq(("t9", Seq("save"), Seq.empty[String], null: String, "{}"))
      .toDF("task_id", "dest_ports", "executed", "payload_url", "payload_json")
    val out = KafkaEdge.encodeEnvelope(env, lit("save"))
    assert(out.schema.fields.map(f => f.name -> f.dataType).toSeq == Seq(
      "topic" -> StringType, "key" -> BinaryType, "value" -> BinaryType))
  }

  test("salted count equals plain count under extreme key skew") {
    val skewed = spark.range(100000).select(
      when($"id" % 100 === 0, lit("cold" + ($"id" % 7)))
        .otherwise(lit("HOT")).as("k"))
    val plain = skewed.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, "k", 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(plain("HOT") > 90000)
  }

  test("explodeSalts replicates the small side once per salt bucket") {
    val dim = Seq(("HOT", 1), ("cold", 2)).toDF("k", "v")
    val out = Skew.explodeSalts(dim, 4)
    assert(out.count() == 8)
    assert(out.select("salt").distinct().count() == 4)
  }
}
