package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.{CompletionCounter, StreamingOps}

/** Structured Streaming operators run to completion against the file
  * source as MULTI-batch streams (three event-time-contiguous files,
  * one per micro-batch — see StreamingOps.eventsStream) and dumped via
  * memory sink, so the DuckDB oracle hash-checks the exact result of
  * cross-batch state: join buffers carried between batches, sessions
  * merged across batch boundaries, dedup keys and completion sets
  * surviving the batch cut. All queries run on the RocksDB state store
  * (runToMemory default). Adversarial late-data/watermark behavior is
  * covered by StreamingSpec (MemoryStream), where arrival order can be
  * made hostile on purpose.
  */
object StreamingQueries {
  type Q = (SparkSession, String) => DataFrame

  /** stream_enrich_join: stream-stream inner equi-join with the
    * time-interval buffer (SURVEY J1/J2 shape, event-time form of the
    * ReID assembly join). */
  private val stream_enrich_join: Q = (s, d) => {
    val ev = StreamingOps.eventsStream(s, d)
    val trackletLeg = ev.select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val attrLeg = ev.select(col("event_id"), col("ts"), col("value"))
    val joined = StreamingOps.reidAssemblyJoin(trackletLeg, attrLeg, "event_id", "ts")
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 2).as("value"))
    StreamingOps.runToMemory(s, joined, "graft_stream_enrich", "append")
      .orderBy(col("event_id"))
  }

  /** stream_windowed_agg: event-time tumbling window aggregation
    * (SURVEY W1/W2) — 5-minute windows per event type. */
  private val stream_windowed_agg: Q = (s, d) => {
    val ev = StreamingOps.eventsStream(s, d)
    val agg = ev
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
      .select(unix_timestamp(col("window.start")).as("bucket_start"),
        col("event_type"), col("n"), col("v"))
    StreamingOps.runToMemory(s, agg, "graft_stream_winagg", "complete")
      .orderBy(col("bucket_start"), col("event_type"))
  }

  /** stream_session_agg: event-time SESSION windows per user (5-min
    * inactivity gap) — Spark's native `session_window` doing what the
    * reference's tracklet segmentation hand-rolls (split a per-key
    * event sequence wherever the time gap exceeds a threshold). The
    * oracle is the classic gaps-and-islands rewrite; session end =
    * last event + gap, matching session_window's semantics. */
  private val stream_session_agg: Q = (s, d) => {
    val ev = StreamingOps.eventsStream(s, d)
    val agg = ev
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("v"))
      .select(unix_timestamp(col("session_window.start")).as("session_start"),
        unix_timestamp(col("session_window.end")).as("session_end"),
        col("user_id"), col("n_events"), col("v"))
    StreamingOps.runToMemory(s, agg, "graft_stream_session", "complete")
      .orderBy(col("user_id"), col("session_start"))
  }

  /** stream_completion: flatMapGroupsWithState completion counter
    * (SURVEY A3/K4) — a "pack job" fires exactly once per video when
    * all 5 expected per-type tracklets have been saved. Runs the
    * TTL-bounded production form (event-time timeout). The TTL is
    * sized to the corpus: the synthetic events span 30 days of event
    * time and a task's saves can straddle all three micro-batches, so
    * a production-style 30-minute TTL would expire straddling tasks
    * between batches (correct TTL semantics, wrong oracle). 45 days
    * keeps every task alive across the staged batches while still
    * demonstrating the bounded-state plan. */
  private val stream_completion: Q = (s, d) => {
    import s.implicits._
    val ev = StreamingOps.eventsStream(s, d)
    val saves = ev.select(
      concat(lit("v"), col("user_id").cast("string")).as("task_id"),
      when(col("event_type") === "click", 0)
        .when(col("event_type") === "purchase", 1)
        .when(col("event_type") === "signup", 2)
        .when(col("event_type") === "view", 3)
        .otherwise(4).as("serial"),
      lit(5).as("num_tracklets"),
      col("ts"))
      .withWatermark("ts", "10 minutes")
      .as[CompletionCounter.SaveEventTs]
    val jobs = CompletionCounter
      .completionJobsTtl(saves, stateTtlMs = 45L * 24 * 3600 * 1000).toDF()
      .select(col("task_id"), col("n_saved").cast("long").as("n_saved"))
    StreamingOps.runToMemory(s, jobs, "graft_stream_completion", "append")
      .orderBy(col("task_id"))
  }

  /** stream_dedup: streaming exact-dedup state (P6 in streaming form —
    * the reference drops duplicated storing requests across batches,
    * `vpe/data/DataManagingApp.java:447-455`). dropDuplicates keys the
    * state store on the projected columns; projecting ONLY the key
    * keeps the surviving-row choice deterministic. */
  private val stream_dedup: Q = (s, d) => {
    val ev = StreamingOps.eventsStream(s, d)
    val distinctUsers = ev
      .select(col("user_id"), col("event_type"))
      .dropDuplicates("user_id", "event_type")
    StreamingOps.runToMemory(s, distinctUsers, "graft_stream_dedup", "append")
      .orderBy(col("user_id"), col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "stream_dedup" -> stream_dedup,
    "stream_enrich_join" -> stream_enrich_join,
    "stream_windowed_agg" -> stream_windowed_agg,
    "stream_session_agg" -> stream_session_agg,
    "stream_completion" -> stream_completion)

  val oracles: Map[String, String] = Map(
    "stream_dedup" ->
      """SELECT DISTINCT user_id, event_type
        |FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    "stream_enrich_join" ->
      """SELECT a.event_id, a.user_id, a.event_type, round(b.value, 2) AS value
        |FROM events a JOIN events b
        |  ON a.event_id = b.event_id
        |  AND b.ts >= a.ts - INTERVAL 10 MINUTE
        |  AND b.ts <= a.ts + INTERVAL 10 MINUTE
        |ORDER BY a.event_id""".stripMargin,
    "stream_windowed_agg" ->
      """SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS bucket_start,
        |  event_type, count(*) AS n, round(sum(value), 2) AS v
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY bucket_start, event_type""".stripMargin,
    "stream_session_agg" ->
      // gaps-and-islands twin of session_window: a session's end is
      // EXCLUSIVE (last event + gap), so an event exactly gap-seconds
      // after the previous one starts a NEW session (>=, not >)
      """WITH m AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |g AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
        |  CAST(floor(epoch(max(ts))) AS BIGINT) + 300 AS session_end,
        |  user_id, count(*) AS n_events, round(sum(value), 2) AS v
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "stream_completion" ->
      """SELECT 'v' || CAST(user_id AS VARCHAR) AS task_id,
        |  count(DISTINCT CASE event_type WHEN 'click' THEN 0 WHEN 'purchase' THEN 1
        |    WHEN 'signup' THEN 2 WHEN 'view' THEN 3 ELSE 4 END) AS n_saved
        |FROM events
        |GROUP BY user_id
        |HAVING count(DISTINCT CASE event_type WHEN 'click' THEN 0 WHEN 'purchase' THEN 1
        |    WHEN 'signup' THEN 2 WHEN 'view' THEN 3 ELSE 4 END) = 5
        |ORDER BY task_id""".stripMargin)
}
