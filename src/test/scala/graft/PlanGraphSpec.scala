package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.PlanCompiler
import graft.storage.GraphStore
import graft.operators.Multimodal

class PlanGraphSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("all six command topologies are wired like MessageHandlingApp") {
    val t = PlanCompiler.commandTopologies
    assert(t.keySet == Set("track-only", "track-attrrecog",
      "track-attrrecog-reid", "attrrecog-only", "attrrecog-reid", "reid-only"))
    // full DAG: tracking fans out to attr-recog, reid and save
    assert(t("track-attrrecog-reid")("tracking").toSet ==
      Set(PlanCompiler.AttrRecogPort, PlanCompiler.ReIdPort, PlanCompiler.TrackletSavePort))
    assert(t("track-attrrecog-reid")("attr-recog").toSet ==
      Set(PlanCompiler.ReIdPort, PlanCompiler.AttrSavePort))
    assert(t("track-attrrecog-reid")("reid") == Seq(PlanCompiler.IdRankSavePort))
    // reduced commands have no upstream stages
    assert(!t("attrrecog-reid").contains("tracking"))
    assert(t("track-only")("tracking") == Seq(PlanCompiler.TrackletSavePort))
  }

  test("routing filter delivers a record only to its dest ports") {
    val df = Seq(("r1", Seq("a", "b")), ("r2", Seq("b"))).toDF("id", "dest_ports")
    assert(PlanCompiler.routeTo(df, "a").as[(String, Seq[String])].collect().map(_._1).toSeq == Seq("r1"))
    assert(PlanCompiler.routeTo(df, "b").count() == 2)
    assert(PlanCompiler.routeTo(df, "c").count() == 0)
  }

  test("full pipeline multicast: every tracklet reaches all three sinks") {
    val out = PlanCompiler.executeFullPipeline(spark, sf)
    val counts = out.groupBy("payload_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("tracklet") == counts("attributes"))
    assert(counts("tracklet") == counts("idrank"))
    val paths = out.select("payload_type", "executed_path").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(paths("tracklet") == "tracking")
    assert(paths("attributes") == "attr-recog,tracking")
    assert(paths("idrank") == "attr-recog,reid,tracking")
  }

  test("GraftSession: extensions + views make the surface SQL-reachable") {
    // getOrCreate would return the extension-less shared test session;
    // clear session slots (context is reused) and restore after
    val prevDefault = org.apache.spark.sql.SparkSession.getDefaultSession
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    val s = GraftSession.builder(master = "local[2]").getOrCreate()
    try {
      GraftSession.registerViews(s, sf)
      // custom function by SQL name via extensions + events view with
      // the nanos quirk handled
      val r = s.sql(
        """SELECT dot_long(array(1L,2L), array(3L,4L)) AS d,
          |  (SELECT count(*) FROM events) AS n,
          |  (SELECT cosine_sim(CAST(array(1.0,0.0) AS ARRAY<DOUBLE>),
          |                     CAST(array(1.0,0.0) AS ARRAY<DOUBLE>))) AS c
          |""".stripMargin).head()
      assert(r.getAs[Long]("d") == 11L)
      assert(r.getAs[Long]("n") == 1000L)
      assert(math.abs(r.getAs[Double]("c") - 1.0) < 1e-12)
    } finally {
      // do NOT stop s (it shares the JVM's SparkContext); restore slots
      prevDefault.foreach { p =>
        org.apache.spark.sql.SparkSession.setDefaultSession(p)
        org.apache.spark.sql.SparkSession.setActiveSession(p)
      }
    }
  }

  test("REID_ONLY command: front-loaded join from storage, gallery ranked") {
    import graft.storage.{GraphStore, TrackletStore}
    val dir = java.nio.file.Files.createTempDirectory("graftreid").toString
    val graph = new GraphStore(spark, dir + "/g")
    val store = new TrackletStore(spark, dir + "/s")
    graph.upsertPersons(Seq(
      ("p1", 0.10), ("p2", 0.12), ("p3", 0.50), ("p4", 0.90))
      .toDF("id", "attr0"))
    store.save(Seq(("p1", 0), ("p1", 1), ("p1", 2)).toDF("task_id", "serial"))
    val out = PlanCompiler.executeReidOnly(spark, graph, store, Seq("p1"), "attr0")
      .orderBy($"rank").collect()
    // nearest by attribute distance first
    assert(out.map(_.getAs[String]("candidate_id")).toSeq == Seq("p2", "p3", "p4"))
    assert(out.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
    // stored tracklet resolved (G4 path -> S7 read)
    assert(out.forall(_.getAs[Long]("n_boxes_stored") == 3L))
  }

  test("graph store: upsert persons (G1/G2/G7), lookup (G4/G8)") {
    val dir = java.nio.file.Files.createTempDirectory("graftgraph").toString
    val store = new GraphStore(spark, dir)
    store.upsertPersons(Seq(("p1", "path/a", 0.5f), ("p2", "path/b", 0.7f))
      .toDF("id", "path", "attr0"))
    // MERGE: update p1's path only (attr0 null -> keep current), insert p3
    store.upsertPersons(Seq(("p1", "path/a2", Option.empty[Float]),
      ("p3", "path/c", Some(0.9f))).toDF("id", "path", "attr0"))
    val all = store.readPersons().orderBy("id").collect()
    assert(all.map(_.getString(0)).toSeq == Seq("p1", "p2", "p3"))
    assert(store.getPerson("p1").head().getAs[String]("path") == "path/a2")
    assert(store.getPerson("p1").head().getAs[Float]("attr0") == 0.5f)
    assert(store.getPerson("p2").head().getAs[String]("path") == "path/b")
  }

  test("graph store: similarity edges (G5/G6/G9)") {
    val dir = java.nio.file.Files.createTempDirectory("graftgraph2").toString
    val store = new GraphStore(spark, dir)
    store.upsertSimilar(Seq(("p1", "p2", 0.9f), ("p1", "p3", 0.4f))
      .toDF("src", "dst", "similarity"))
    // MERGE semantics: re-upsert (p1,p2) with a new similarity
    store.upsertSimilar(Seq(("p1", "p2", 0.95f), ("p1", "p4", 0.6f))
      .toDF("src", "dst", "similarity"))
    assert(store.getSimilarity("p1", "p2").contains(0.95f))
    assert(store.getSimilarity("p1", "nope").isEmpty)
    assert(store.neighborCount("p1") == 3)
    val ordered = store.neighbors("p1").select("dst").as[String].collect().toSeq
    assert(ordered == Seq("p2", "p4", "p3")) // similarity DESC
  }

  test("tracklet store: save, compact on completion, idempotent repack, packed-first read") {
    import graft.storage.{CompactionJob, TrackletStore}
    val dir = java.nio.file.Files.createTempDirectory("graftstore").toString
    val store = new TrackletStore(spark, dir)
    val graph = new GraphStore(spark, dir + "/graph")
    // K3: two saves for task A (small-files shape), one for task B
    store.save(Seq(("A", 0, 10), ("A", 1, 11)).toDF("task_id", "serial", "start_frame"))
    store.save(Seq(("A", 2, 12), ("B", 0, 20)).toDF("task_id", "serial", "start_frame"))
    assert(store.readTask("A").count() == 3)
    assert(!store.isPacked("A"))

    // K4/K7: task A completes -> compact + repoint
    graph.upsertPersons(Seq(("A", "raw/A"), ("B", "raw/B")).toDF("id", "path"))
    val repointed = CompactionJob.run(spark, Seq("A"), store, graph)
    assert(repointed.map(_._1) == Seq("A"))
    assert(store.isPacked("A") && !store.isPacked("B"))
    // packed-first read returns the same rows; raw partition removed
    assert(store.readTask("A").select("serial").as[Int].collect().sorted.toSeq == Seq(0, 1, 2))
    assert(!new java.io.File(dir + "/raw/task_id=A").exists())
    // B untouched, still raw-readable
    assert(store.readTask("B").count() == 1)
    // metadata repointed for A only
    assert(graph.getPerson("A").head().getAs[String]("path").contains("packed"))
    assert(graph.getPerson("B").head().getAs[String]("path") == "raw/B")

    // idempotence: re-running compaction is a no-op with same rows
    CompactionJob.run(spark, Seq("A"), store, graph)
    assert(store.readTask("A").count() == 3)
    // schema stability: packed and raw reads expose the same columns
    assert(store.readTask("A").columns.sorted.toSeq ==
      store.readTask("B").columns.sorted.toSeq)
  }

  test("multimodal decode: batch processing equals single-row processing") {
    val docs = Tables.documents(spark, sf).limit(100)
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val batched = Multimodal.decodeMeta(docs, "payload", batchSize = 7)
      .select("doc_id", "meta.*").orderBy("doc_id").collect()
    val single = Multimodal.decodeMeta(docs, "payload", batchSize = 1)
      .select("doc_id", "meta.*").orderBy("doc_id").collect()
    assert(batched.sameElements(single))
    // stub parity with direct application
    val direct = docs.orderBy("doc_id").collect().map { r =>
      Multimodal.decodeStub(r.getAs[Array[Byte]]("payload"))
    }
    batched.zip(direct).foreach { case (row, meta) =>
      assert(row.getAs[Int]("width") == meta.width)
      assert(row.getAs[Int]("height") == meta.height)
    }
  }

  test("F7 pixel preprocessing: (x-128)/256 with float output") {
    val out = Seq((1L, Seq(0, 128, 255))).toDF("id", "pixels")
      .select(Multimodal.preprocessPixels($"pixels").as("p"))
      .as[Seq[Float]].head()
    assert(out == Seq(-0.5f, 0.0f, 127f / 256f))
  }

  test("multimodal null/empty payload passes through with sentinel meta") {
    val df = Seq((1L, Array[Byte](65, 66)), (2L, Array.empty[Byte]))
      .toDF("id", "payload")
    val out = Multimodal.decodeMeta(df, "payload").select("id", "meta.*")
      .orderBy("id").collect()
    assert(out(0).getAs[String]("format") == "fakeimg")
    assert(out(1).getAs[String]("format") == "empty")
    assert(out(1).getAs[Int]("width") == 0)
  }
}
