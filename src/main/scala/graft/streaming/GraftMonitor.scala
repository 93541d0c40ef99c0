package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener

/** K8 monitoring surface (SURVEY §2.2): the reference runs a dedicated
  * reporter thread publishing per-node throughput, JVM memory, and GPU
  * stats (`vpe/util/logging/MonitorThread.java:35-186`, minus NVML —
  * no GPUs here). The Spark-native shape is listener-based: a
  * [[StreamingQueryListener]] captures per-batch progress (rows/s,
  * per-sink counts, state-store size) and a [[QueryExecutionListener]]
  * captures batch-action completions (duration, output rows), each
  * tagged with the JVM heap snapshot the reference's report carries.
  * Pull-based `reports` accessors rather than a log sink: callers
  * (tests, a metrics exporter, a driver UI) choose the transport.
  */
final class GraftMonitor private (spark: SparkSession) {
  import GraftMonitor._

  // bounded ring buffers: a monitor attached to a week-long streaming
  // app must not grow the driver heap without bound (a monitor that
  // leaks is worse than no monitor). Oldest reports evict first.
  private val batchQ = new ConcurrentLinkedQueue[BatchReport]()
  private val actionQ = new ConcurrentLinkedQueue[ActionReport]()

  private def addCapped[T](q: ConcurrentLinkedQueue[T], v: T): Unit = {
    q.add(v)
    while (q.size() > MaxReports) q.poll()
  }

  private val streamingListener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      addCapped(batchQ, BatchReport(
        queryName = Option(p.name).getOrElse(p.id.toString),
        batchId = p.batchId,
        inputRows = p.numInputRows,
        rowsPerSec = p.processedRowsPerSecond,
        sink = p.sink.description,
        stateRows = p.stateOperators.map(_.numRowsTotal).sum,
        heapUsedMb = heapUsedMb()))
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }

  private val execListener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      addCapped(actionQ, ActionReport(funcName, durationNs / 1000000L,
        rootMetric(qe, "numOutputRows"), failed = false, heapUsedMb(),
        observed = qe.observedMetrics.view.mapValues(row =>
          row.schema.fieldNames.zip(row.toSeq).toMap).toMap))
    override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit =
      addCapped(actionQ, ActionReport(funcName, -1L, -1L, failed = true, heapUsedMb()))
  }

  /** Per-batch streaming progress captured so far (oldest first). */
  def batchReports: Seq[BatchReport] = batchQ.iterator().asScala.toSeq

  /** Batch-action completions captured so far (oldest first). */
  def actionReports: Seq[ActionReport] = actionQ.iterator().asScala.toSeq

  /** Rows/s per sink, aggregated over captured batches — the
    * reference report's throughput table. */
  def sinkThroughput: Map[String, Double] =
    batchReports.groupBy(_.sink).view.mapValues { bs =>
      val good = bs.map(_.rowsPerSec).filter(r => !r.isNaN && !r.isInfinite)
      if (good.isEmpty) 0.0 else good.sum / good.size
    }.toMap

  def detach(): Unit = {
    spark.streams.removeListener(streamingListener)
    spark.listenerManager.unregister(execListener)
  }

  private[streaming] def attachListeners(): Unit = {
    spark.streams.addListener(streamingListener)
    spark.listenerManager.register(execListener)
  }
}

object GraftMonitor {

  /** Retention cap per report kind (ring-buffer semantics). */
  val MaxReports: Int = 4096

  /** One streaming micro-batch as the monitor reports it. */
  case class BatchReport(queryName: String, batchId: Long, inputRows: Long,
                         rowsPerSec: Double, sink: String, stateRows: Long,
                         heapUsedMb: Long)

  /** One completed (or failed) batch action. `observed` carries the
    * plan's `Dataset.observe` named metrics (observation name →
    * metric name → value) — the A5 per-batch bookkeeping that rides
    * the action's own job instead of costing a second one (the
    * flagship pipeline observes its save-sink counts this way). */
  case class ActionReport(action: String, durationMs: Long, outputRows: Long,
                          failed: Boolean, heapUsedMb: Long,
                          observed: Map[String, Map[String, Any]] = Map.empty)

  /** Register a monitor on the session; caller detaches when done. */
  def attach(spark: SparkSession): GraftMonitor = {
    val m = new GraftMonitor(spark)
    m.attachListeners()
    m
  }

  private def heapUsedMb(): Long = {
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) >> 20
  }

  private def rootMetric(qe: QueryExecution, name: String): Long =
    qe.executedPlan.metrics.get(name).map(_.value).getOrElse(-1L)
}
