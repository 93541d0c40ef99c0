package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central table loader for the driver-provided parquet testdata.
  *
  * All queries receive `(spark, sfDir)` and resolve tables here, so the
  * physical layout (one parquet file per table) is encapsulated in one
  * place. At cluster scale these would be catalog tables (partitioned /
  * bucketed parquet or Delta); the API below is the only thing the
  * query layer sees, so swapping the storage layer is a one-file change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized per (session, path): re-reading the same table re-lists
  // files and re-reads footers; 48 registry queries touch the same ten
  // tables, so reuse the immutable DataFrame plan. Keyed on the session
  // too — plans are session-bound.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val MaxCacheEntries = 256

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // bounded: entries strongly reference their session, so an
    // unbounded map would pin stopped sessions for the JVM's life
    if (cache.size() > MaxCacheEntries) cache.clear()
    cache.computeIfAbsent((spark, s"$sfDir/$name.parquet"),
      k => k._1.read.parquet(k._2))
  }

  /** Name-dispatched loader that applies per-table quirks (events'
    * TIMESTAMP(NANOS) handling). Prefer this over `table` for generic
    * access. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir) else table(spark, sfDir, name)

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts has shipped under two physical encodings across testdata
    * generations: parquet TIMESTAMP(NANOS) (no native Spark type — read
    * as raw long nanos via the legacy flag, then truncate to µs,
    * matching DuckDB's ns→µs truncation) and plain timestamp[us]
    * (reads as TIMESTAMP_NTZ). Normalize both to TimestampType; the
    * session timezone is pinned to UTC everywhere, so the NTZ cast is
    * lossless and agrees with DuckDB's epoch arithmetic. */
  def events(s: SparkSession, d: String): DataFrame = {
    // nanosAsLong is intentionally session-permanent: it only affects
    // schema mapping of parquet TIMESTAMP(NANOS) columns (no other
    // graft table has one), and the scan that needs it executes lazily
    // — restoring it before the action runs would break the read it
    // was set for (see StreamingOps.rawEventsNs).
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000L")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => raw
      // fail fast on an unanticipated encoding: a silent pass-through
      // would flow unnormalized timestamps into every downstream query
      // (rawEventsNs enforces the same contract on the staging path)
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
