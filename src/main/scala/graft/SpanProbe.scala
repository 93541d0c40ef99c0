package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decomposition probe for dedup_span_ngrams (round-13 perf item):
  * times the stages of the span pipeline separately so the 4×
  * like-for-like constant can be attributed — gram kernel, dup
  * groupBy, position join, span merge — each to a noop write.
  * Usage: scripts/run_main.sh graft.SpanProbe [sfDir]
  */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(df: => DataFrame): Unit = {
      // warm once, then best of 3
      df.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"stage":"$name","min_s":${ts.min}%.3f}""")
    }

    val K = 8
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("n_tok"))
    val toks8 = (0 until K).map(o => element_at(col("toks"), col("start") + o))
    def grams: DataFrame = base.filter(col("n_tok") >= K)
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(1), col("n_tok") - (K - 1)))
          .as(Seq("_i", "start")))
      .select(col("doc_id"), col("start"),
        xxhash64(toks8: _*).as("g1"),
        hash(toks8: _*).cast("long").as("g2"))

    println(s"""{"n_docs":${base.count()},"n_grams":${grams.count()}}""")
    time("scan_split")(base.select(col("doc_id"), col("n_tok")))
    time("grams_once")(grams)
    time("dup_groupby")(grams.groupBy(col("g1"), col("g2"))
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)
      .select(col("g1"), col("g2")))
    time("dup_pos_join") {
      val dup = grams.groupBy(col("g1"), col("g2"))
        .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)
        .select(col("g1"), col("g2"))
      grams.join(dup, Seq("g1", "g2")).select(col("doc_id"), col("start"))
    }
    time("window_form") {
      import org.apache.spark.sql.expressions.Window
      grams.withColumn("cnt",
          count(lit(1)).over(Window.partitionBy(col("g1"), col("g2"))))
        .filter(col("cnt") > 1).select(col("doc_id"), col("start"))
    }
    time("full_query")(
      graft.SparkEntry.queries("dedup_span_ngrams")(spark, sfDir))
    spark.stop()
  }
}
