package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.GraftMonitor

/** K8 observability: the listener-based analog of the reference's
  * MonitorThread report (rows/s, per-sink counts, heap), asserted
  * against the flagship pipeline and a stateful stream. */
class MonitorSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Listener buses deliver asynchronously; poll briefly. */
  private def eventually[T](what: String)(probe: => Option[T]): T = {
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    var r = probe
    while (r.isEmpty && System.nanoTime() < deadline) { Thread.sleep(50); r = probe }
    r.getOrElse(fail(s"no $what observed within 15s"))
  }

  test("batch actions on the flagship pipeline are observed with duration + rows") {
    val m = GraftMonitor.attach(spark)
    try {
      val n = SparkEntry.queries("vpe_plan_pipeline")(spark, sf).collect().length
      assert(n > 0)
      val rep = eventually("action report") {
        m.actionReports.find(r => !r.failed && r.action == "collect")
      }
      assert(rep.durationMs >= 0)
      assert(rep.heapUsedMb > 0, "JVM heap snapshot expected in the report")
    } finally m.detach()
  }

  test("flagship observe() metrics ride the action into the monitor") {
    val m = GraftMonitor.attach(spark)
    try {
      val n = SparkEntry.queries("vpe_plan_pipeline")(spark, sf).collect().length
      val rep = eventually("action report carrying graft_pipeline metrics") {
        m.actionReports.find(r => !r.failed && r.observed.contains("graft_pipeline"))
      }
      val obs = rep.observed("graft_pipeline")
      // the observed save count must equal the rows the action returned
      // (same job, no second pass) and all three save sinks must appear
      assert(obs("n_saved") == n.toLong, s"observed=$obs collected=$n")
      assert(obs("n_sinks") == 3L, s"observed=$obs")
    } finally m.detach()
  }

  test("streaming batches report rows/s, sink, and state-store size") {
    implicit val sqlCtx = spark.sqlContext
    val m = GraftMonitor.attach(spark)
    try {
      val in = MemoryStream[(Long, Timestamp)]
      val agg = in.toDF().toDF("v", "ts")
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "5 minutes")).agg(count(lit(1)).as("n"))
      val q = agg.writeStream.format("memory")
        .queryName("monitor_stream_test").outputMode("append").start()
      try {
        in.addData((1L, Timestamp.valueOf("2024-01-01 10:00:00")),
          (2L, Timestamp.valueOf("2024-01-01 10:01:00")))
        q.processAllAvailable()
        val rep = eventually("batch report with input rows") {
          m.batchReports.find(b => b.inputRows > 0 &&
            b.queryName == "monitor_stream_test")
        }
        assert(rep.sink.toLowerCase.contains("memory"), s"sink=${rep.sink}")
        assert(rep.rowsPerSec > 0.0)
        assert(rep.stateRows > 0, "windowed agg must report state rows")
        assert(m.sinkThroughput.keys.exists(_.toLowerCase.contains("memory")))
      } finally q.stop()
    } finally m.detach()
  }
}
