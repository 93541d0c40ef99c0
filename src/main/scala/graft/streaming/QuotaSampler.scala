package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key quota sampler — the streaming form of the batch
  * `pipeline_cap_per_key` mixing cap (SURVEY P6/W9 shape): keep the
  * first `k` events per key in EVENT-TIME order, with the running
  * count carried across micro-batches in keyed state.
  *
  * Determinism: within a batch invocation the group's rows are sorted
  * by (event time, event_id); the staged file source delivers
  * event-time-CONTIGUOUS batches (StreamingOps.eventsStream), so the
  * per-key concatenation of batch-local orders IS the global event-time
  * order and the kept set equals the batch `row_number() <= k` twin
  * exactly. On an arrival-ordered source (MemoryStream, Kafka without
  * reordering) the same operator degrades to arrival-order quota —
  * the cross-batch counter semantics are identical either way
  * (StreamingSpec pins them under hostile arrival).
  *
  * State: ONE long per key — bounded by key cardinality, not traffic
  * (8 bytes/user: a billion users is 8 GB across all stores). For an
  * UNBOUNDED key space the TTL pattern of
  * [[CompletionCounter.completionJobsTtl]] applies, with the semantic
  * caveat that expiry re-opens a key's quota for the next retention
  * horizon — a per-horizon cap, which is usually what a continuous
  * ingestion pipeline wants anyway.
  */
object QuotaSampler {

  case class QuotaEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  case class KeptEvent(event_id: Long, user_id: Long, quota_rank: Long)

  def perKeyQuota(ev: DataFrame, k: Int): Dataset[KeptEvent] = {
    require(k > 0, "quota must be positive")
    import ev.sparkSession.implicits._
    ev.select(col("user_id"), col("ts"), col("event_id")).as[QuotaEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, KeptEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[QuotaEvent], state: GroupState[Long]) =>
          val seen = state.getOption.getOrElse(0L)
          val sorted = rows.toIndexedSeq.sortBy(r =>
            (r.ts.toInstant.getEpochSecond, r.ts.getNanos.toLong, r.event_id))
          // count every event seen (not just kept): a key's rank is its
          // global event index, so late extra traffic can never re-open
          // a filled quota
          state.update(seen + sorted.size)
          sorted.iterator.zipWithIndex
            .map { case (r, i) => (r, seen + i + 1) }
            .filter { case (_, rank) => rank <= k }
            .map { case (r, rank) => KeptEvent(r.event_id, user, rank) }
      }
  }
}
