package graft

import java.net.ServerSocket
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite
import graft.model.BoundingBox
import graft.operators.ExternComparer
import graft.operators.ExternComparer.{ComparePair, CompareResponse, PersonWire}

/** Drives the extern pair-comparer wire protocol end-to-end against an
  * in-JVM solver implementing the reference's async byte format (16B
  * UUID + per-person mode/payload; UUID-correlated responses that may
  * arrive OUT OF ORDER). */
class ExternComparerSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Deterministic solver: similarity = |meanPixA - meanPixB| / 255 for
    * full-mode persons, 0.5 for feature-only; responses for every TWO
    * requests are sent in REVERSED order to exercise the UUID
    * correlation; echoes person A's feature when it was sent. */
  private def startSolver(): (ServerSocket, AtomicInteger) = {
    val server = new ServerSocket(0)
    val connections = new AtomicInteger(0)
    def meanOrHalf(p: PersonWire): Double = p.feature match {
      case Some(_) => 0.5 * 255
      case None =>
        val pix = p.samples.flatMap(_.patch.get.map(_ & 0xff))
        if (pix.isEmpty) 0.0 else pix.sum.toDouble / pix.size
    }
    val t = new Thread(() => {
      try {
        while (!server.isClosed) {
          val s = server.accept()
          connections.incrementAndGet()
          new Thread(() => {
            try {
              val in = s.getInputStream
              val out = s.getOutputStream
              val buffer = scala.collection.mutable.Buffer.empty[CompareResponse]
              while (!s.isClosed) {
                val (msb, lsb, a, b) = ExternComparer.decodeRequest(in)
                val sim = (math.abs(meanOrHalf(a) - meanOrHalf(b)) / 255.0).toFloat
                buffer += CompareResponse(msb, lsb, sim, a.feature, None)
                if (buffer.size == 2) { // reply out of order
                  buffer.reverse.foreach(ExternComparer.writeResponse(out, _))
                  buffer.clear()
                }
              }
            } catch { case _: Throwable => /* client closed */ }
          }).start()
        }
      } catch { case _: Throwable => /* server closed */ }
    })
    t.setDaemon(true)
    t.start()
    (server, connections)
  }

  private def full(fill: Byte): PersonWire = PersonWire(
    None,
    Seq(BoundingBox(0, 0, 2, 2, Some(Array.fill(12)(fill)))),
    s"""{"gender_male":${fill / 255.0}}""")

  private def featOnly(seed: Byte): PersonWire =
    PersonWire(Some(Array.fill(ExternComparer.FeatureNumBytes)(seed)), Seq.empty, "")

  test("comparer protocol: pipelined pairs, out-of-order responses correlate by id") {
    val (server, connections) = startSolver()
    try {
      val pairs = Seq(
        ComparePair("p1", full(0), full(102)),   // |0-102|/255 = 0.4
        ComparePair("p2", full(51), full(51)),   // 0.0
        ComparePair("p3", featOnly(1), full(0)), // |127.5-0|/255 = 0.5
        ComparePair("p4", full(255.toByte), full(0))) // 1.0
        .toDS().repartition(1) // one connection so the 2-batch reorder hits
      val out = ExternComparer.compareExtern(
        pairs, "127.0.0.1", server.getLocalPort)
        .collect().map(r => r.getString(0) -> r.getFloat(1)).toMap
      assert(out.keySet == Set("p1", "p2", "p3", "p4"))
      assert(math.abs(out("p1") - 0.4f) < 1e-6)
      assert(out("p2") == 0.0f)
      assert(math.abs(out("p3") - 0.5f) < 1e-6)
      assert(out("p4") == 1.0f)
      assert(connections.get() == 1)
    } finally server.close()
  }

  test("lockstep solver + pairs beyond the window cannot deadlock") {
    // a solver that reads exactly one request then writes its response
    // (never reading ahead) is the shape that deadlocked a
    // write-window-first client; the listener thread must keep the
    // pipeline moving for > maxInFlight pairs
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      try {
        val s = server.accept()
        val in = s.getInputStream
        val out = s.getOutputStream
        while (!s.isClosed) {
          val (msb, lsb, a, b) = ExternComparer.decodeRequest(in)
          ExternComparer.writeResponse(out,
            ExternComparer.CompareResponse(msb, lsb, lsb.toFloat, a.feature, b.feature))
        }
      } catch { case _: Throwable => () }
    })
    t.setDaemon(true)
    t.start()
    try {
      val n = 50 // > default maxInFlight of 32
      val pairs = (1 to n).map(i =>
        ComparePair(s"p$i", featOnly((i % 7).toByte), featOnly(3)))
        .toDS().repartition(1)
      val out = ExternComparer.compareExtern(
        pairs, "127.0.0.1", server.getLocalPort, maxInFlight = 32)
        .collect()
      assert(out.length == n)
      assert(out.map(_.getString(0)).toSet == (1 to n).map(i => s"p$i").toSet)
    } finally server.close()
  }

  test("codec: request bytes follow the reference layout exactly") {
    val req = ExternComparer.encodeRequest(3L, 4L, full(9), featOnly(7))
    val buf = java.nio.ByteBuffer.wrap(req)
    assert(buf.getLong() == 3L)  // UUID msb
    assert(buf.getLong() == 4L)  // UUID lsb
    // person A: full mode
    assert(buf.get() == 0)       // mode flag
    assert(buf.getInt() == 1)    // sample count
    assert(buf.getInt() == 0 && buf.getInt() == 0) // x, y
    assert(buf.getInt() == 2 && buf.getInt() == 2) // w, h
    val pix = new Array[Byte](12)
    buf.get(pix)
    assert(pix.forall(_ == 9))
    val json = s"""{"gender_male":${9 / 255.0}}"""
    assert(buf.getInt() == json.length) // char count (reference quirk)
    val jb = new Array[Byte](json.length)
    buf.get(jb)
    assert(new String(jb, "UTF-8") == json)
    // person B: feature-only mode
    assert(buf.get() == 1)
    val feat = new Array[Byte](ExternComparer.FeatureNumBytes)
    buf.get(feat)
    assert(feat.forall(_ == 7) && !buf.hasRemaining)
  }

  test("codec: response round-trip including optional features") {
    val fa = Array.fill(ExternComparer.FeatureNumBytes)(5.toByte)
    val bos = new java.io.ByteArrayOutputStream()
    ExternComparer.writeResponse(bos, CompareResponse(8L, 9L, 0.25f, Some(fa), None))
    val r = ExternComparer.readResponse(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    assert(r == CompareResponse(8L, 9L, 0.25f, r.featA, None))
    assert(r.featA.get.toSeq == fa.toSeq)
  }
}
