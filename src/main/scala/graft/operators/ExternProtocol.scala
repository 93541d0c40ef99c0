package graft.operators

import java.io.{BufferedOutputStream, DataInputStream, InputStream, OutputStream}
import java.net.Socket
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.model.{BoundingBox, Tracklet}

/** The extern-recognizer TCP surface (SURVEY X2-EXT): the reference
  * ships tracklet samples to an out-of-process solver over a raw
  * socket and reads attribute JSON back
  * (`alg/pedestrian/attr/ExternRecognizer.java:69-233`). Wire format
  * reproduced byte-for-byte:
  *
  *   request:  4B big-endian sample count, then per sample the
  *             BoundingBox form (`Tracklet.java:244-254`):
  *             16B header (x, y, width, height as BE ints) +
  *             width*height*3 pixel bytes (absent when patch is null);
  *   response: 4B big-endian JSON length + UTF-8 attribute JSON.
  *
  * Execution shape: `mapPartitions` with ONE socket per partition
  * (the reference holds one per recognizer instance — X7 per-executor
  * resource reuse), lazy connect, request/response per tracklet.
  */
object ExternProtocol {

  // ---- client-side codec ----

  def encodeRequest(samples: Seq[BoundingBox]): Array[Byte] = {
    // Fail fast on malformed patches: the protocol (and decodeRequest)
    // assumes exactly width*height*3 pixel bytes per box; a mismatch
    // would silently desynchronize the shared wire stream for every
    // subsequent sample on the connection.
    samples.foreach { b =>
      require(b.patch.isDefined,
        "extern request sample without a patch: decodeRequest readFully's " +
          "width*height*3 bytes per sample, so a missing patch would " +
          "desynchronize every subsequent sample on the connection")
      require(b.patch.get.length == b.width * b.height * 3,
        s"patch length ${b.patch.get.length} != width*height*3 = ${b.width * b.height * 3}")
    }
    val patchBytes = samples.map(_.patch.map(_.length).getOrElse(0)).sum
    val buf = ByteBuffer.allocate(4 + samples.size * 16 + patchBytes)
    buf.putInt(samples.size)
    samples.foreach { b =>
      buf.putInt(b.x); buf.putInt(b.y); buf.putInt(b.width); buf.putInt(b.height)
      b.patch.foreach(buf.put)
    }
    buf.array()
  }

  def readResponse(in: InputStream): String = {
    val din = new DataInputStream(in)
    val len = din.readInt()
    require(len > 0, s"invalid JSON length $len")
    val jsonBytes = new Array[Byte](len)
    din.readFully(jsonBytes)
    new String(jsonBytes, StandardCharsets.UTF_8)
  }

  // ---- server-side codec (for solver implementations / tests) ----

  /** Decode one request. Patch byte counts are width*height*3 per the
    * reference contract; boxes whose patch was stripped contribute no
    * pixel bytes ONLY if encoded that way — the reference only ships
    * sample boxes (patch != null), and so do we (getSamples analog). */
  def decodeRequest(in: InputStream): Seq[BoundingBox] = {
    val din = new DataInputStream(in)
    val n = din.readInt()
    (0 until n).map { _ =>
      val x = din.readInt(); val y = din.readInt()
      val w = din.readInt(); val h = din.readInt()
      val patch = new Array[Byte](w * h * 3)
      din.readFully(patch)
      BoundingBox(x, y, w, h, Some(patch))
    }
  }

  def writeResponse(out: OutputStream, json: String): Unit = {
    val bytes = json.getBytes(StandardCharsets.UTF_8)
    val buf = ByteBuffer.allocate(4 + bytes.length)
    buf.putInt(bytes.length)
    buf.put(bytes)
    val bos = new BufferedOutputStream(out)
    bos.write(buf.array())
    bos.flush()
  }

  // ---- the distributed operator ----

  private val outSchema = StructType(Seq(
    StructField("tracklet_id", StringType),
    StructField("attr_json", StringType)))

  /** Recognize attributes for each tracklet via the extern solver:
    * one connection per partition, sample boxes only (patch present),
    * request/response per tracklet. Returns (tracklet_id, attr_json). */
  def recognizeExtern(tracklets: Dataset[Tracklet], host: String, port: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    tracklets.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val socket = new Socket(host, port)
        socket.setTcpNoDelay(true)
        // Close on task completion (success OR failure): draining alone
        // would leak one connection per partition whenever the task
        // fails mid-stream or a downstream limit stops consuming early.
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => socket.close())
        val out = socket.getOutputStream
        val in = socket.getInputStream
        val results = it.map { t =>
          val samples = t.locationSequence.filter(_.patch.isDefined)
          out.write(encodeRequest(samples))
          out.flush()
          Row(t.id, readResponse(in))
        }
        if (tc != null) results
        else new Iterator[Row] { // no task context (driver-side/test use):
          def hasNext: Boolean = { // fall back to close-on-drain
            val h = results.hasNext
            if (!h) socket.close()
            h
          }
          def next(): Row = results.next()
        }
      }
    }(enc)
  }
}
