package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned-at-rest storage (SURVEY K3's layout concern): the
  * reference lays tracklets out by task/video directory precisely so a
  * point retrieval touches one directory instead of the whole store
  * (`HadoopHelper.java:232-286`). The Spark-native analog is a
  * partitioned parquet table: a filter on the partition key becomes a
  * PartitionFilter at plan time and the scan never lists, opens, or
  * reads the other partitions' files. At 100 TB this is the first
  * scale lever a real deployment pulls — an unpruned full scan is the
  * difference between touching 3 of 30 day-directories and reading
  * 100 TB to answer a 3-day query.
  */
object PartitionedStore {

  /** Build-once cache for derived table layouts: `build` writes the
    * table to the path it is given; the result is keyed by (sfDir,
    * events source size+mtime, name) under the JVM temp dir, built
    * under a temp name and atomically renamed so concurrent processes
    * see a complete table or build their own. Returns the table path. */
  private[graft] def cached(sfDir: String, name: String)
                           (build: String => Unit): String = synchronized {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(sfDir, "events.parquet")
    val dir = Paths.get(sys.props("java.io.tmpdir"),
      "graft_part_" + Integer.toHexString(sfDir.hashCode) +
        "_" + graft.streaming.StreamingOps.sourceFingerprint(src), name)
    if (Files.isDirectory(dir)) return dir.toString
    val tmp = dir.resolveSibling(dir.getFileName.toString + ".build_" +
      java.util.UUID.randomUUID().toString.take(8))
    build(tmp.toString)
    try Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileAlreadyExistsException |
           _: java.nio.file.DirectoryNotEmptyException =>
        org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
    dir.toString
  }

  /** events re-written partitioned by event-time day (yyyyMMdd int),
    * once per (sfDir, source fingerprint). Returns the table path. */
  def eventsByDay(spark: SparkSession, sfDir: String): String =
    cached(sfDir, "events_by_day") { path =>
      graft.Tables.events(spark, sfDir)
        .withColumn("day", date_format(col("ts"), "yyyyMMdd").cast("int"))
        .write.partitionBy("day").mode("overwrite").parquet(path)
    }

  /** Read the day-partitioned events table back. Partition-type
    * inference gives `day` IntegerType; a filter on it prunes at the
    * file-listing level (PartitionFilters in the scan node). */
  def readEventsByDay(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(eventsByDay(spark, sfDir))
}

/** The at-rest analog of Kafka's per-topic multicast (SURVEY K1/S2):
  * a routed record with destinations {reid, save} is physically
  * present in BOTH topics — the reference achieves this by producing
  * the message to each destination topic (`Stream.java:47-70`); here
  * the routed stream is EXPLODED on `dest_ports` and written
  * partitioned by `port`. Writer invariant (what
  * [[graft.plans.RoutingPushdown]] relies on): a row is stored under
  * partition `p` iff `array_contains(dest_ports, p)`. A consumer's
  * routing filter then becomes partition selection — the Spark-native
  * form of "subscribe to one topic". */
object RoutedStore {

  /** Write `routed` (must carry `dest_ports: array<string>`) as a
    * port-partitioned table at `path`; one copy of each record per
    * destination port. */
  def write(routed: DataFrame, path: String): Unit =
    routed
      .withColumn("port", explode(col("dest_ports")))
      .write.partitionBy("port").mode("overwrite").parquet(path)

  /** Read a routed table back; `filter(array_contains($"dest_ports",
    * p))` on the result is rewritten to partition selection when
    * RoutingPushdown is active. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
