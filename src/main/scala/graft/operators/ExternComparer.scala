package graft.operators

import java.io.{BufferedOutputStream, DataInputStream, DataOutputStream, InputStream, OutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.types._
import graft.model.BoundingBox

/** The extern pair-comparer TCP surface (SURVEY X4, transport form):
  * the reference ships PAIRS of pedestrians to an out-of-process
  * comparer and correlates ASYNC responses by request UUID
  * (`alg/pedestrian/reid/ExternPedestrianComparerUsingAttr.java:30-120`
  * doc block; request writer 200-290; ResultListener 300-365).
  *
  * Wire format reproduced byte-for-byte (all integers big-endian):
  *
  *   request:  16B request UUID (msb, lsb); then for each of the 2
  *             pedestrians: 1B mode flag — 1 = feature-only, followed
  *             by 4096 feature bytes (Feature1024); 0 = full data,
  *             followed by 4B sample count, per sample the 16B bbox
  *             header + width*height*3 pixels (`Tracklet.java:244-254`),
  *             then 4B attribute-JSON length + UTF-8 JSON;
  *   response: 16B request UUID, 4B float similarity, then per
  *             pedestrian 1B retFlag + (if set) 4096 feature bytes.
  *
  * Reference quirk kept: the JSON length field is the CHARACTER count
  * (`attrJson.length()`), while the payload is UTF-8 bytes — identical
  * only for ASCII JSON, which attribute JSON always is; encode rejects
  * non-ASCII rather than desynchronize the stream.
  *
  * Execution shape: one socket per partition, WINDOWED PIPELINING —
  * up to `maxInFlight` outstanding requests, responses correlated by
  * UUID and emitted in completion order (the reference's listener
  * thread + result pool, minus the thread: the window bound gives the
  * same on-wire concurrency with task-failure-safe teardown).
  */
object ExternComparer {

  val FeatureLength = 1024
  val FeatureNumBytes: Int = FeatureLength * 4 // Feature1024.NUM_BYTES

  /** One pedestrian on the wire: a known feature (feature-only mode)
    * OR sample boxes + attribute JSON (full mode). */
  case class PersonWire(feature: Option[Array[Byte]],
                        samples: Seq[BoundingBox],
                        attrJson: String)

  case class ComparePair(pair_id: String, a: PersonWire, b: PersonWire)

  case class CompareResponse(idMsb: Long, idLsb: Long, similarity: Float,
                             featA: Option[Array[Byte]],
                             featB: Option[Array[Byte]])

  // ---- client-side codec ----

  private def writePerson(dout: DataOutputStream, p: PersonWire): Unit =
    p.feature match {
      case Some(f) =>
        require(f.length == FeatureNumBytes,
          s"feature must be $FeatureNumBytes bytes, got ${f.length}")
        dout.write(1)
        dout.write(f)
      case None =>
        dout.write(0)
        dout.writeInt(p.samples.size)
        p.samples.foreach { b =>
          require(b.patch.isDefined && b.patch.get.length == b.width * b.height * 3,
            "sample must carry exactly width*height*3 pixel bytes")
          dout.writeInt(b.x); dout.writeInt(b.y)
          dout.writeInt(b.width); dout.writeInt(b.height)
          dout.write(b.patch.get)
        }
        require(p.attrJson.forall(_ < 128),
          "attribute JSON must be ASCII (the reference writes the char " +
            "count as the length of a UTF-8 payload)")
        dout.writeInt(p.attrJson.length)
        dout.write(p.attrJson.getBytes(StandardCharsets.UTF_8))
    }

  def encodeRequest(idMsb: Long, idLsb: Long,
                    a: PersonWire, b: PersonWire): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val dout = new DataOutputStream(bos)
    dout.writeLong(idMsb)
    dout.writeLong(idLsb)
    writePerson(dout, a)
    writePerson(dout, b)
    dout.flush()
    bos.toByteArray
  }

  def readResponse(in: InputStream): CompareResponse = {
    val din = new DataInputStream(in)
    val msb = din.readLong()
    val lsb = din.readLong()
    val sim = din.readFloat()
    def feat(): Option[Array[Byte]] =
      if (din.readByte() != 0) {
        val f = new Array[Byte](FeatureNumBytes)
        din.readFully(f); Some(f)
      } else None
    CompareResponse(msb, lsb, sim, feat(), feat())
  }

  // ---- server-side codec (for solver implementations / tests) ----

  def decodeRequest(in: InputStream): (Long, Long, PersonWire, PersonWire) = {
    val din = new DataInputStream(in)
    val msb = din.readLong()
    val lsb = din.readLong()
    def person(): PersonWire =
      if (din.readByte() != 0) {
        val f = new Array[Byte](FeatureNumBytes)
        din.readFully(f)
        PersonWire(Some(f), Seq.empty, "")
      } else {
        val n = din.readInt()
        val samples = (0 until n).map { _ =>
          val x = din.readInt(); val y = din.readInt()
          val w = din.readInt(); val h = din.readInt()
          val patch = new Array[Byte](w * h * 3)
          din.readFully(patch)
          BoundingBox(x, y, w, h, Some(patch))
        }
        val jsonLen = din.readInt()
        val jsonBytes = new Array[Byte](jsonLen)
        din.readFully(jsonBytes)
        PersonWire(None, samples, new String(jsonBytes, StandardCharsets.UTF_8))
      }
    (msb, lsb, person(), person())
  }

  def writeResponse(out: OutputStream, r: CompareResponse): Unit = {
    val dout = new DataOutputStream(new BufferedOutputStream(out))
    dout.writeLong(r.idMsb)
    dout.writeLong(r.idLsb)
    dout.writeFloat(r.similarity)
    Seq(r.featA, r.featB).foreach {
      case Some(f) =>
        require(f.length == FeatureNumBytes)
        dout.write(1); dout.write(f)
      case None => dout.write(0)
    }
    dout.flush()
  }

  // ---- the distributed operator ----

  private val outSchema = StructType(Seq(
    StructField("pair_id", StringType),
    StructField("similarity", FloatType)))

  /** Compare pedestrian pairs via the extern solver. One connection
    * per partition; up to `maxInFlight` requests on the wire at once;
    * rows come back in COMPLETION order (async contract). */
  def compareExtern(pairs: Dataset[ComparePair], host: String, port: Int,
                    maxInFlight: Int = 32): DataFrame = {
    require(maxInFlight > 0)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    pairs.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val socket = new Socket(host, port)
        val tc = org.apache.spark.TaskContext.get()
        // register BEFORE any call that can throw (stream setup, reader
        // start): a failure in that window must not leak the fd. Closing
        // the socket also unblocks the listener thread (blocking read
        // throws), so this one hook releases everything on the task path.
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => socket.close())
        socket.setTcpNoDelay(true)
        val out = new BufferedOutputStream(socket.getOutputStream)
        val in = socket.getInputStream
        // Responses drain on a dedicated listener thread (the
        // reference's ResultListener): the writer never blocks on
        // unread responses, so a solver whose response writes fill the
        // TCP buffers cannot deadlock the request path.
        val queue =
          new java.util.concurrent.LinkedBlockingQueue[Either[Throwable, CompareResponse]]()
        val reader = new Thread(() => {
          try { while (true) queue.put(Right(readResponse(in))) }
          catch { case e: Throwable => queue.put(Left(e)) }
        }, "extern-comparer-listener")
        reader.setDaemon(true)
        reader.start()
        // non-task (driver/test) path cleanup: close + belt-and-braces
        // interrupt of the listener thread
        def closeAll(): Unit = {
          try socket.close() finally reader.interrupt()
        }
        val pending = scala.collection.mutable.HashMap.empty[(Long, Long), String]
        var counter = 0L
        def sendOne(): Unit = {
          val p = it.next()
          counter += 1 // unique per connection is all the wire needs
          out.write(encodeRequest(0L, counter, p.a, p.b))
          out.flush()
          pending += ((0L, counter) -> p.pair_id)
        }
        new Iterator[Row] {
          def hasNext: Boolean = {
            val h = pending.nonEmpty || it.hasNext
            if (!h && tc == null) closeAll() // no task context: test use
            h
          }
          // any failure mid-stream would otherwise strand the socket and
          // listener thread on the non-task path (no completion listener
          // fires there) — close before rethrowing
          def next(): Row =
            try nextImpl()
            catch { case e: Throwable => if (tc == null) closeAll(); throw e }
          private def nextImpl(): Row = {
            while (it.hasNext && pending.size < maxInFlight) sendOne()
            val r = queue.take() match {
              case Right(resp) => resp
              case Left(e) => throw new IllegalStateException(
                "extern comparer connection failed with " +
                  s"${pending.size} responses outstanding", e)
            }
            val pid = pending.remove((r.idMsb, r.idLsb)).getOrElse(
              throw new IllegalStateException(
                s"extern comparer answered unknown request id ${r.idLsb}"))
            Row(pid, r.similarity)
          }
        }
      }
    }(enc)
  }
}
