package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic: decompose the one-pass LSH near-dup Jaccard
  * (`Dedup.lshJaccardPairs`, SCALING.md §4.6) into its stages at a
  * given ScaleGen rung, so "the 2M rung is slow" becomes "stage X is
  * slow". Times, cumulatively:
  *   1. hash     — shingle-hash kernel scan (count of hashed sets)
  *   2. banded   — + signature + band explode + hot-key refinement
  *   3. cand     — + band-key self-join (candidate pair COUNT, before
  *                 the per-pair Jaccard or the pair-dedup aggregation)
  *   4. full     — the complete operator (what the ladder measures)
  * Each stage re-runs the prefix (no caching), so stage deltas are
  * directly comparable. Not a driver surface.
  *
  * Usage: runMain graft.NearDupProbe [nDocs] [rowsPerBand]
  */
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 2000000L
    val rowsPerBand = if (args.length > 1) args(1).toInt else 4
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
    val base = sys.env.getOrElse("GRAFT_SCALE_BASE", "target/scale")
    val dir = s"$base/n$nDocs"
    ScaleGen.ensure(spark, dir, nDocs = nDocs, nVecs = nDocs / 2,
      nEvents = nDocs * 2)

    import graft.operators.Dedup
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[neardup-probe] $label%-10s ${(System.nanoTime() - t0) / 1e9}%9.2f s")
      r
    }
    def hashed = Dedup.shingleHashSets(
      Tables.documents(spark, dir).repartition(col("doc_id")),
      "doc_id", "text", 5)

    // JVM/codegen warmup so stage 1 doesn't absorb classloading
    hashed.limit(1000).write.format("noop").mode("overwrite").save()

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // 1. hs materialization alone (noop forces every column — count()
    //    would let Catalyst prune the md5 kernel away entirely)
    timed("hash") { noop(hashed) }
    // 2. + signatures, band explode, hot-key refinement, shifted+sorted
    //    int sets — the full one-pass prefix incl. its interior actions
    val keyed = Dedup.probeKeyed(hashed, rowsPerBand)
    timed("keyed") { noop(keyed) }
    // 2b. refined-bucket population histogram: Σ pop·(pop−1)/2 is the
    //     exact pair-enumeration bound of the band join, and the top
    //     populations show whether one pile (e.g. an exact-duplicate
    //     chain, content-salted together BY DESIGN) dominates it
    val hist = timed("pophist") {
      keyed.groupBy("k", "band", "band_sig", "sub").count()
        .select(sum(col("count") * (col("count") - 1) / 2).as("pairs"),
          count(lit(1)).as("nkeys"), max(col("count")).as("maxpop"))
        .collect()(0)
    }
    val top = keyed.groupBy("k", "band", "band_sig", "sub").count()
      .orderBy(col("count").desc).limit(5)
      .collect().map(_.getAs[Long]("count")).toSeq
    println(s"[neardup-probe] pair bound=${hist.get(0)} nkeys=${hist.getAs[Long]("nkeys")} " +
      s"maxpop=${hist.getAs[Long]("maxpop")} top5=$top")
    // 3. the self-join, skinny: output needs only ids, so Catalyst
    //    prunes the set payload OUT of the exchange — isolates
    //    key-hashing + build/probe cost
    val nCand = timed("joinSkinny") {
      keyed.as("a").join(keyed.as("b").hint("SHUFFLE_HASH"),
          col("a.k") === col("b.k") &&
            col("a.band") === col("b.band") &&
            col("a.band_sig") === col("b.band_sig") &&
            col("a.sub") === col("b.sub") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).count()
    }
    // 4. the complete operator (fat join + merges + pair groupBy)
    val full = Dedup.lshJaccardPairs(hashed, rowsPerBand)
    val nOut = timed("full") { noop(full) }
    println("[neardup-probe] plan of the full operator:")
    println(full.queryExecution.executedPlan.toString.linesIterator
      .take(60).mkString("\n"))
    println(s"""{"n_docs":$nDocs,"candidates":$nCand,"out_pairs":${full.count()}}""")
    spark.stop()
  }
}
