package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off decomposition of clustersFromIndex cost at a rung (round-10
  * investigation: 4M = 10.1 s, 8M = 83.6 s — which stage broke the
  * flatness?). Times each input separately, then CC off fully cached
  * inputs. */
object CcDecomp {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.getOrElse("8000000").toLong
    val base = sys.env.getOrElse("GRAFT_SCALE_BASE", "target/scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val idxDir = s"$base/sigidx_n$n"
    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
    }
    val (tPairs, nPairs) = t(spark.read.parquet(s"$idxDir/pairs")
      .filter(col("jaccard_bp") >= 5000).count())
    val pairsFiles = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(idxDir, "pairs")))(
      _.count())
    val (tVerts, nVerts) = t(spark.read.parquet(s"$idxDir/sig")
      .select(col("doc_id")).count())
    val edges = spark.read.parquet(s"$idxDir/pairs")
      .filter(col("jaccard_bp") >= 5000)
      .select(col("id_a"), col("id_b")).cache()
    edges.count()
    val verts = spark.read.parquet(s"$idxDir/sig").select(col("doc_id")).cache()
    verts.count()
    val (tCc, _) = t(graft.operators.Dedup
      .connectedComponents(verts, "doc_id", edges)
      .write.format("noop").mode("overwrite").save())
    println(f"""{"n":$n,"pairs":$nPairs,"pairs_scan_sec":$tPairs%.1f,""" +
      f""""pairs_files":$pairsFiles,"verts":$nVerts,"verts_scan_sec":$tVerts%.1f,""" +
      f""""cc_cached_sec":$tCc%.1f,"cc_rounds":${graft.operators.Dedup.lastCcRounds}}""")
    spark.stop()
  }
}
