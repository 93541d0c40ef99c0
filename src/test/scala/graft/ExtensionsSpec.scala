package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Locks the SparkSessionExtensions surface: every SQL name
  * GraftExtensions registers must resolve and compute through plain
  * `spark.sql` on a session built with `.withExtensions`. This is the
  * path a SQL-only user of the library takes (no Scala column API). */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate would silently reuse the extension-less session the
    // other suites built (withExtensions applies only at creation) —
    // clear the handles so a NEW session (sharing the SparkContext)
    // is created with the extensions, then restore the default.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s =
      try SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      finally {
        prevDefault.foreach(SparkSession.setDefaultSession)
        prevActive.foreach(SparkSession.setActiveSession)
      }
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("every registered scalar function resolves and computes via SQL") {
    val row = spark.sql(
      """SELECT
        |  dot_long(array(1L, 2L), array(3L, 4L))            AS dot,
        |  round(cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS cos,
        |  l2sq_long(array(1L, 5L), array(4L, 1L))           AS l2,
        |  size(shingle_hash32('abcdef', 5))                 AS n_shingles,
        |  size(token_hash32('a b c'))                       AS n_tokens,
        |  size(minhash_sigs(shingle_hash32('hello world', 5))) AS n_sigs,
        |  simhash32(token_hash32('hello world'))            AS sh,
        |  simhash64(token_hash64('hello world'))            AS sh64,
        |  content_fingerprint('hello world')                AS fp
        |""".stripMargin).collect().head
    assert(row.getAs[Long]("dot") == 11L)
    assert(row.getAs[Double]("cos") == 1.0)
    assert(row.getAs[Long]("l2") == 25L)
    assert(row.getAs[Int]("n_shingles") == 2)  // abcde, bcdef
    assert(row.getAs[Int]("n_tokens") == 3)
    assert(row.getAs[Int]("n_sigs") == graft.functions.HashFunctions.MinHashCoeffs.size)
    assert(row.getAs[Long]("sh") >= 0L)
    // the 64-bit fingerprint's low half votes with the same token
    // hashes as the 32-bit one
    assert((row.getAs[Long]("sh64") & 0xffffffffL) == row.getAs[Long]("sh"))
    assert(row.getAs[Long]("fp") >= 0L)
  }

  test("SQL names agree with the column-API kernels") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.HashExpressions
    val viaSql = spark.sql(
      "SELECT content_fingerprint('the quick brown fox') AS f").head.getLong(0)
    val viaCol = spark.range(1)
      .select(HashExpressions.content_fingerprint(lit("the quick brown fox")))
      .head.getLong(0)
    assert(viaSql == viaCol)
  }

  test("vector_mean aggregate resolves through SQL (analyzer wraps it)") {
    spark.sql(
      """SELECT * FROM VALUES ('a', array(1.0D, 2.0D)), ('a', array(3.0D, 6.0D)),
        |('b', array(10.0D, 20.0D)) AS t(k, vec)""".stripMargin)
      .createOrReplaceTempView("vm_input")
    val rows = spark.sql(
      "SELECT k, vector_mean(vec) AS m FROM vm_input GROUP BY k ORDER BY k")
      .collect()
    assert(rows(0).getAs[scala.collection.Seq[Double]]("m").toSeq == Seq(2.0, 4.0))
    assert(rows(1).getAs[scala.collection.Seq[Double]]("m").toSeq == Seq(10.0, 20.0))
  }

  test("shingle_hash32 SQL form accepts any foldable k expression") {
    // the builder evals k at resolution time, so constant-folded
    // expressions configure the kernel just like bare literals
    val n = spark.sql("SELECT size(shingle_hash32('abcdef', 2 + 3)) AS n")
      .head.getInt(0)
    assert(n == 2) // abcde, bcdef at k = 5
  }

  test("RoutingPushdown is active via extension injection (no install call)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ext_routed_").toString
    graft.storage.RoutedStore.write(
      Seq((1L, Seq("a", "b")), (2L, Seq("a"))).toDF("id", "dest_ports"), dir)
    val plan = graft.storage.RoutedStore.read(spark, dir)
      .filter(array_contains(col("dest_ports"), "b"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*port".r.findFirstIn(plan).isDefined
        && plan.contains("= b"),
      s"extension-built session must prune by port without install():\n$plan")
  }
}
