package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev diagnostic for the 4M-rung ann_lsh_topk curve (SCALING.md
  * §4.11): stage-by-stage wall times at a given corpus size —
  * (a) quantize+cache+bucket keys, (b) the bucket-local pair join with
  * scores, (c) + the per-src top-k — so the superlinear term is
  * attributable. Usage: runMain graft.LshProbe 4000000 */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 4000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = sys.env.getOrElse("GRAFT_SCALE_BASE", "target/scale")
    val dir = s"$base/n$nDocs"
    ScaleGen.ensure(spark, dir, nDocs = nDocs, nVecs = nDocs / 2, nEvents = nDocs * 2)
    import graft.operators.Similarity
    def timed(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[lsh-probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val emb0 = Tables.embeddings(spark, dir).select(
      col("vec_id"), Similarity.quantize(col("embedding")).as("qv")).cache()
    val n = emb0.count()
    val nBits = Similarity.deriveNBits(n)
    println(s"[lsh-probe] nVecs=$n nBits=$nBits")
    timed("a: bucket keys")(
      Similarity.skewSafeBucketKeys(emb0, "vec_id", 64, nBits)
        .write.format("noop").mode("overwrite").save())
    val emb = Similarity.skewSafeBucketKeys(emb0, "vec_id", 64, nBits)
    val a = emb.select(col("bucket"), col("sub"), col("vec_id").as("src"), col("qv").as("qa"))
    val b = emb.select(col("bucket"), col("sub"), col("vec_id").as("dst"), col("qv").as("qb"))
    val pairs = a.join(b, Seq("bucket", "sub")).filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), Similarity.dotLong(col("qa"), col("qb")).as("score"))
    timed("b: pair join + scores")(
      pairs.write.format("noop").mode("overwrite").save())
    timed("c: + top-3 per src")(
      Similarity.topKPerKey(pairs, "src", "score", "dst", 3)
        .write.format("noop").mode("overwrite").save())
    // d: same, but the pair-producing join widened so the partial
    // top-k's per-task sort stays in memory (the §4.9 width lever)
    for (w <- Seq(128, 256)) {
      val aw = a.repartition(w, col("bucket"), col("sub"))
      val bw = b.repartition(w, col("bucket"), col("sub"))
      val pw = aw.join(bw, Seq("bucket", "sub")).filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"), Similarity.dotLong(col("qa"), col("qb")).as("score"))
      timed(s"d: join+topk @ width $w")(
        Similarity.topKPerKey(pw, "src", "score", "dst", 3)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
