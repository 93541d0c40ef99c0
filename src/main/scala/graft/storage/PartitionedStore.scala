package graft.storage

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Format version of the derived layouts built through [[cached]],
    * embedded in every cache-directory name. Same staleness class as
    * StreamingOps.StageFormatVersion: the (source size+mtime) key sees
    * source regeneration but not a code change to the derived layout
    * itself. Bump on any layout/schema/unit change to a cached table.
    *   v1: round-6 initial   v2: RoutedStore copies carry their own
    *   port only in dest_ports (multiplicity fix, see RoutedStore)
    *   v3: produceStream lands each micro-batch in its own batch=<id>
    *   sub-partition (exactly-once replay commit) */
  private[graft] val FormatVersion = 3

  /** Build-once cache for derived table layouts: `build` writes the
    * table to the path it is given; the result is keyed by (FORMAT
    * VERSION, sfDir, source size+mtime, name) under the JVM temp dir,
    * built under a temp name and atomically renamed so concurrent
    * processes see a complete table or build their own. `source` names
    * the table the layout is derived from (fingerprint basis). Returns
    * the table path. */
  private[graft] def cached(sfDir: String, name: String,
                            source: String = "events.parquet",
                            version: Int = FormatVersion)
                           (build: String => Unit): String = synchronized {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(sfDir, source)
    val dir = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_part_v${version}_" + Integer.toHexString(sfDir.hashCode) +
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

  /** Small-file COMPACTION (the OPTIMIZE/maintenance half of a table
    * layout): rewrite a table into ~`targetFiles` files, sorted within
    * files by `sortCols` so parquet row-group min/max stats stay
    * selective after the rewrite. Small-file sprawl is the silent
    * 100-TB killer — a streaming sink or over-parallel writer leaves
    * thousands of KB-sized files per partition, and every subsequent
    * scan pays per-file listing/open/footer cost. The rewrite is one
    * range-partitioned shuffle; data content is untouched, which is
    * exactly what the oracle checks. */
  def compact(df: DataFrame, path: String, targetFiles: Int,
              sortCols: Seq[String]): Unit =
    df.repartitionByRange(targetFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
}

/** Z-ORDER layout: MULTI-dimensional pruning at rest, the lever
  * one-dimensional partitioning ([[PartitionedStore.eventsByDay]])
  * cannot provide. A day-partitioned table prunes time-range queries
  * but reads every directory for a user-range query; interleaving the
  * bits of a (user-bucket, day-bucket) pair into a Z-value and
  * partitioning by it keeps rows that are close in BOTH dimensions in
  * the same files, so a 2-D box query touches only the Z-prefixes the
  * box intersects — the curve-clustering trick behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`. This is the coarse (partition-level) form;
  * within-file Z-sorting would additionally prune parquet row groups
  * by min/max, same math one level down.
  *
  * All bucket/interleave arithmetic is integer-exact and mirrored in
  * the DuckDB oracle, so the layout is correctness-checked, not just
  * plan-audited.
  */
object ZOrderStore {

  /** Bits per dimension: 4+4 → a 0..255 Z-value / ≤256 directories. */
  val Bits = 4

  /** Z-layout version, embedded in the cache name (bump on any change
    * to bucket geometry — same staleness class as the store versions).
    *   v1: user width 64   v2: user width 4 (the testdata's user_id
    *   cardinality scales with SF; width 4 spreads the spec SF's 15
    *   users across buckets instead of collapsing them into one) */
  val LayoutVersion = 2

  /** User-range bucket: floor(user_id / 4), capped at 15 — monotone in
    * user_id, so a user range maps to a contiguous bucket range. */
  val UserBucketWidth = 4L

  private def interleave(ub: Int, db: Int): Int =
    (0 until Bits).map(i =>
      (((ub >> i) & 1) << (2 * i + 1)) | (((db >> i) & 1) << (2 * i))).sum

  /** Column form of the same interleave — plain div/mod arithmetic
    * (codegen'd, and expressible verbatim in the oracle SQL). */
  private def zCol(ub: Column, db: Column): Column =
    (0 until Bits).map(i =>
      (ub.divide(1 << i).cast("int") % 2) * (1 << (2 * i + 1)) +
        (db.divide(1 << i).cast("int") % 2) * (1 << (2 * i)))
      .reduce(_ + _)

  private def ubCol: Column =
    least((col("user_id") / UserBucketWidth).cast("int"), lit((1 << Bits) - 1))
  /** Day-of-month pairs (corpus spans one month): (dom-1)/2 → 0..15. */
  private def dbCol: Column = ((dayofmonth(col("ts")) - 1) / 2).cast("int")

  /** The Z-partitions a 2-D box intersects: cross product of the two
    * bucket ranges, interleaved. Bounded driver-side enumeration
    * (≤ 16×16), same decision class as broadcast thresholds. */
  def boxPartitions(uLo: Long, uHi: Long, domLo: Int, domHi: Int): Seq[Int] = {
    val cap = (1 << Bits) - 1
    val ubs = math.min(uLo / UserBucketWidth, cap).toInt to
      math.min(uHi / UserBucketWidth, cap).toInt
    val dbs = ((domLo - 1) / 2) to ((domHi - 1) / 2)
    for (ub <- ubs; db <- dbs) yield interleave(ub, db)
  }

  /** events re-written partitioned by Z-value, once per (sfDir, source
    * fingerprint, format version). */
  def eventsByZ(spark: SparkSession, sfDir: String): String =
    PartitionedStore.cached(sfDir, s"events_by_z_v$LayoutVersion") { path =>
      graft.Tables.events(spark, sfDir)
        .withColumn("zp", zCol(ubCol, dbCol))
        .write.partitionBy("zp").mode("overwrite").parquet(path)
    }

  def readEventsByZ(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(eventsByZ(spark, sfDir))
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
    * destination port. Each stored COPY carries only its own port in
    * `dest_ports` — exactly what a Kafka message produced to one topic
    * carries (`Stream.java:47-70` sends the payload per topic, not the
    * routing table). This makes the row-wise invariant EXACT:
    * `array_contains(dest_ports, p)` is true iff the row lives in
    * partition p, so RoutingPushdown's rewrite is a strict equivalence.
    * (Storing the full array made the un-rewritten filter match every
    * copy of a multi-routed record — the rule would have CHANGED the
    * result multiplicity, an unsound optimization.) */
  def write(routed: DataFrame, path: String): Unit =
    routed
      .withColumn("port", explode(col("dest_ports")))
      .withColumn("dest_ports", array(col("port")))
      .write.partitionBy("port").mode("overwrite").parquet(path)

  /** Read a routed table back; `filter(array_contains($"dest_ports",
    * p))` on the result is rewritten to partition selection when
    * RoutingPushdown is active. The producer's physical `batch`
    * sub-partition (absent from batch-written layouts) is dropped —
    * it is a commit unit, not data. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("batch")

  /** STREAMING producer half of the routed store (the Kafka
    * `producer.send(topic, …)` analog, K1's write side): each
    * micro-batch multicast-explodes on `dest_ports` and lands in the
    * port-partitioned layout via foreachBatch, so a record with
    * destinations {a, b} lands once under `port=a` and once under
    * `port=b` — exactly [[write]]'s invariant, maintained
    * incrementally. Runs the stream to completion (file-source
    * catch-up semantics; a resident pipeline would leave the query
    * running).
    *
    * EXACTLY-ONCE under mid-batch failure: each micro-batch writes
    * into its OWN `batch=<id>` sub-partition with DYNAMIC partition
    * overwrite. foreachBatch re-delivers an uncommitted batch with
    * the SAME batchId on restart, and the transform is deterministic,
    * so the replay overwrites exactly the partitions the crashed
    * attempt touched — a no-op in content — instead of appending a
    * second copy (the blind-append form duplicated the whole batch; a
    * Kafka deployment gets the same contract from the idempotent/
    * transactional producer). Readers treat `batch` as an opaque
    * physical sub-partition: [[read]] drops it, and the routing
    * invariant (row under `port=p` iff `array_contains(dest_ports,
    * p)`) is untouched. */
  def produceStream(routed: DataFrame, path: String): Unit = {
    import java.nio.file.Files
    val ckpt = Files.createTempDirectory("graft_routed_produce_ckpt_")
    try {
      val q = routed.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          appendBatchExactlyOnce(batch, batchId, path)
        }
        .option("checkpointLocation", ckpt.toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally org.apache.commons.io.FileUtils.deleteDirectory(ckpt.toFile)
  }

  /** One micro-batch of the routed producer — the idempotent commit
    * unit (exposed for the replay spec). Dynamic overwrite of the
    * (port, batch) partitions this batch's rows map to: a replay of
    * the same (batch, batchId) rewrites those partitions with
    * identical content; partitions of OTHER batches are untouched. */
  private[graft] def appendBatchExactlyOnce(batch: DataFrame, batchId: Long,
                                            path: String): Unit =
    batch
      .withColumn("port", explode(col("dest_ports")))
      .withColumn("dest_ports", array(col("port")))
      .withColumn("batch", lit(batchId))
      .write
      .partitionBy("port", "batch")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(path)

  /** STREAMING topic subscription over the routed layout — the true
    * analog of handing a Kafka consumer a topic list. The batch rule
    * ([[graft.plans.RoutingPushdown]]) prunes the SCAN, but a file
    * STREAM's cost center is upstream of any plan: FileStreamSource
    * lists its input glob on every trigger and tracks every discovered
    * file in its seen-map forever. Subscribing by restricting the glob
    * to the chosen ports' directories means un-subscribed topics are
    * never listed, never enter the source log, and never wake a
    * trigger — at 100 TB with 30 topics and one subscriber per topic,
    * per-trigger listing work drops 30× and checkpoint source logs stop
    * growing with OTHER topics' traffic. `basePath` keeps `port` a
    * partition column, so downstream code sees the same schema as
    * [[read]]. */
  def subscribe(spark: SparkSession, path: String,
                ports: Seq[String]): DataFrame = {
    require(ports.nonEmpty, "subscribe needs at least one port")
    // DATA schema from a bounded batch read (footer-only) — the `port`
    // partition column is not in the files; each per-port source
    // re-attaches it as a literal (a Kafka consumer knows which topic
    // a record came from the same way: from the subscription, not the
    // payload). One file-stream source per subscribed port, unioned —
    // exactly a consumer subscribed to N topics — so each source's
    // listing glob IS its topic directory and nothing else ever enters
    // its seen-file log. (A single glob + basePath read would also
    // subscribe, but FileStreamSource's per-batch relation loses the
    // discovered partition values in this Spark version.)
    val dataSchema = org.apache.spark.sql.types.StructType(
      spark.read.parquet(path).schema.filterNot(_.name == "port"))
    ports.map { p =>
      spark.readStream
        .schema(dataSchema)
        .parquet(s"$path/port=$p")
        .withColumn("port", lit(p))
    }.reduce(_.unionAll(_))
  }
}

/** Bucket-co-located storage for BIG-BIG joins — the second at-rest
  * scale lever next to [[PartitionedStore]]'s pruning: both join sides
  * are written `bucketBy(N, key).sortBy(key)`, so the join's required
  * hash distribution is satisfied by the LAYOUT and the SortMergeJoin
  * shuffles nothing (PlanAuditSpec asserts zero hash-partitioning
  * exchanges in the executed plan). At 100 TB this is the difference
  * between a fact-fact join that moves the whole table over the network
  * on every run and one that moves zero bytes — the shuffle is paid
  * once at write time and amortized over every subsequent join, which
  * is why warehouses bucket their largest co-joined tables.
  *
  * Catalog-backed deliberately: bucket metadata lives in the table
  * catalog, not the parquet footers — a bare path read of the same
  * files forgets the layout and reintroduces both exchanges.
  */
object BucketedStore {

  /** Bucket count. On a real cluster this is sized to target
    * bucket-file sizes (~128-256 MB) and kept EQUAL on both sides —
    * mismatched counts reintroduce a shuffle on one side. */
  val Buckets = 8

  /** orders + lineitem co-bucketed by order key: written once per
    * (catalog, sfDir, source fingerprint) as external tables whose data
    * lives under the JVM temp dir, then served from the catalog.
    * Fingerprint-keyed like the staging caches, so a regenerated
    * source re-builds instead of silently serving stale buckets. */
  /** Format version of the bucketed layout, embedded in table/dir
    * names — bump on any bucketing/schema change (same staleness class
    * as PartitionedStore.FormatVersion). */
  private[graft] val FormatVersion = 1

  def ordersLineitemByOrderKey(spark: SparkSession,
                               sfDir: String): (DataFrame, DataFrame) =
    synchronized {
      import java.nio.file.Paths
      val fp = s"v${FormatVersion}_" + Integer.toHexString(sfDir.hashCode) + "_" +
        graft.streaming.StreamingOps.sourceFingerprint(
          Paths.get(sfDir, "lineitem.parquet"))
      val oT = s"graft_orders_bkt_$fp"
      val lT = s"graft_lineitem_bkt_$fp"
      val base = Paths.get(sys.props("java.io.tmpdir"), s"graft_bucketed_$fp")
      if (!spark.catalog.tableExists(oT))
        graft.Tables.orders(spark, sfDir).write.mode("overwrite")
          .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
          .option("path", base.resolve(oT).toString).saveAsTable(oT)
      if (!spark.catalog.tableExists(lT))
        graft.Tables.lineitem(spark, sfDir).write.mode("overwrite")
          .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
          .option("path", base.resolve(lT).toString).saveAsTable(lT)
      (spark.table(oT), spark.table(lT))
    }
}
