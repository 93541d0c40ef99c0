package graft

import java.net.ServerSocket
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{BoundingBox, Tracklet}
import graft.operators.ExternProtocol

/** Drives the extern-recognizer wire protocol end-to-end against an
  * in-JVM solver implementing the reference's byte format (4B count,
  * 16B bbox header + w*h*3 pixels; 4B length + JSON reply). */
class ExternProtocolSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Deterministic solver: score = mean pixel value of all samples /
    * 255, echoed with the sample count. */
  private def startSolver(): (ServerSocket, AtomicInteger) = {
    val server = new ServerSocket(0)
    val connections = new AtomicInteger(0)
    val t = new Thread(() => {
      try {
        while (!server.isClosed) {
          val s = server.accept()
          connections.incrementAndGet()
          new Thread(() => {
            try {
              val in = s.getInputStream
              val out = s.getOutputStream
              while (!s.isClosed) {
                val samples = ExternProtocol.decodeRequest(in)
                val pix = samples.flatMap(_.patch.get.map(_ & 0xff))
                val score = if (pix.isEmpty) 0.0 else pix.sum.toDouble / pix.size / 255.0
                ExternProtocol.writeResponse(out,
                  s"""{"n_samples":${samples.size},"score":$score}""")
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

  private def box(x: Int, fill: Byte): BoundingBox =
    BoundingBox(x, 0, 2, 2, Some(Array.fill(2 * 2 * 3)(fill)))

  test("extern recognizer protocol round-trips; one connection per partition") {
    val (server, connections) = startSolver()
    try {
      val tracklets = Seq(
        Tracklet("v1", 0, 2, 0, Seq(box(1, 51), box(2, 51), BoundingBox(3, 0, 2, 2, None))),
        Tracklet("v1", 1, 2, 5, Seq(box(4, 102))),
        Tracklet("v2", 0, 1, 0, Seq(box(5, 0), box(6, 0))))
        .toDS().repartition(2)
      val out = ExternProtocol.recognizeExtern(
        tracklets, "127.0.0.1", server.getLocalPort)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap

      // patch-less boxes excluded (getSamples analog): v1_tarid0 has 2 samples
      assert(out("v1_tarid0") == s"""{"n_samples":2,"score":${51.0 / 255}}""")
      assert(out("v1_tarid1") == s"""{"n_samples":1,"score":${102.0 / 255}}""")
      assert(out("v2_tarid0") == """{"n_samples":2,"score":0.0}""")
      // connection reuse: at most one connection per non-empty partition
      assert(connections.get() <= 2)
    } finally server.close()
  }

  test("codec: request bytes follow the reference layout exactly") {
    val req = ExternProtocol.encodeRequest(Seq(box(7, 9)))
    val buf = java.nio.ByteBuffer.wrap(req)
    assert(buf.getInt() == 1)       // sample count, big endian
    assert(buf.getInt() == 7)       // x
    assert(buf.getInt() == 0)       // y
    assert(buf.getInt() == 2)       // width
    assert(buf.getInt() == 2)       // height
    val pix = new Array[Byte](12)   // 2*2*3 pixels
    buf.get(pix)
    assert(pix.forall(_ == 9) && !buf.hasRemaining)
  }
}
