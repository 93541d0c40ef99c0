package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON metrics line.
  *
  * Methodology:
  *  - JVM/codegen warmup pass first (one light query) so the first
  *    measured query doesn't absorb classloading + codegen costs;
  *  - results are written to the `noop` sink, which forces full
  *    column materialization (a bare .count() would let Catalyst prune
  *    every projected column and under-measure scan-heavy queries).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def runToNoop(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: exercise scan + shuffle + codegen paths once, untimed
    SparkEntry.queries.get("q1_agg")
      .foreach(fn => fn(spark, sfDir).write.format("noop").mode("overwrite").save())

    // Each query runs twice: the first (cold) execution pays one-time
    // plan codegen/JIT (~0.5-1.4 s per distinct plan, measured); the
    // second is steady-state. A long-running engine amortizes compile
    // across thousands of executions, so `queries`/`value` report
    // steady-state; `cold_total` keeps the first-run total transparent.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val cold = names.map(n => n -> runToNoop(n))
    val warm = names.map(n => n -> runToNoop(n))
    val qs = warm.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // per-query cold times too: attributing a cold_total movement needs
    // per-query evidence, not a single sum
    val cqs = cold.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = warm.map(_._2).sum
    val coldTotal = cold.map(_._2).sum
    // failed queries are listed explicitly — a crashing query must not
    // masquerade as a fast success in the totals
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","cold_total":$coldTotal,"failed":$failedJson,"queries":$qs,"cold_queries":$cqs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
