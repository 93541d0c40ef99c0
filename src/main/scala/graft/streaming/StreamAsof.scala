package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING AS-OF enrichment — the stateful cousin of the batch
  * [[graft.operators.TemporalJoins.asOfJoin]] and the shape the
  * reference's late-data semantics point at: enrich each probe record
  * with the NEWEST EARLIER build record of its key, where "earlier"
  * spans the whole stream so far, not just the current micro-batch
  * (reference: the ReID app matches each tracklet against the last
  * known attribute state of the pedestrian,
  * `PedestrianReIDUsingAttrApp.java:156-198`).
  *
  * State per key is ONE build row (ts, id, value) — the newest seen —
  * carried by `flatMapGroupsWithState`: O(|keys|) state regardless of
  * stream length, the bounded-state contract a 100-TB pipeline needs
  * (a production deployment adds a TTL for keys that go quiet; the
  * registered oracle keeps every key live on purpose so the
  * cross-batch carry is what the hash proves).
  *
  * Ordering contract: within a micro-batch the group's rows arrive
  * unordered, so each batch's group is sorted by (ts, build-first,
  * id) before the carry runs; ACROSS batches correctness needs batch
  * event-time ranges to be non-decreasing — exactly what the staged
  * event-time-contiguous sources provide (same argument as
  * [[QuotaSampler]]). At equal timestamps a build row matches
  * inclusively (build sorts before probe — the batch asOfJoin's
  * `__side` rule), and build ties on (key, ts) resolve to the
  * greatest id (the determinism contract the batch form requires the
  * caller to pre-aggregate; here the sort makes it explicit).
  */
object StreamAsof {

  /** One input record: a build row (is_build) or a probe row. The
    * payload fields are NULLABLE on purpose: the state carry must move
    * the build row ATOMICALLY (a NULL field in the newest build row
    * stays NULL in the enrichment — it may never "see through" to an
    * older row's value), and the oracle's null patterns prove it. */
  case class AsofEvent(user_id: Long, ts_us: Long, is_build: Boolean,
                       event_id: Long, value: Option[Double],
                       tag: Option[Long])

  /** Newest build row seen for a key — replaced whole, never
    * field-merged. */
  case class BuildState(ts_us: Long, event_id: Long,
                        value: Option[Double], tag: Option[Long])

  /** Probe row enriched with the newest-earlier build row (None when
    * no build row precedes it). */
  case class AsofOut(event_id: Long, user_id: Long, ts_us: Long,
                     asof_event_id: Option[Long], asof_value: Option[Double],
                     asof_tag: Option[Long])

  /** Enrich the probe rows of `events` with the newest earlier build
    * row per user_id, carrying one BuildState per key across
    * micro-batches. */
  def enrich(events: Dataset[AsofEvent]): Dataset[AsofOut] = {
    implicit val outEnc = Encoders.product[AsofOut]
    implicit val stEnc = Encoders.product[BuildState]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[BuildState, AsofOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(carry)
  }

  private def carry(key: Long, rows: Iterator[AsofEvent],
                    state: GroupState[BuildState]): Iterator[AsofOut] = {
    // build-before-probe at equal ts (inclusive match); build ties on
    // ts resolve to the greatest event_id by sorting ascending and
    // letting the later row overwrite the carry
    val sorted = rows.toSeq.sortBy(r => (r.ts_us, !r.is_build, r.event_id))
    var last = state.getOption
    val out = Seq.newBuilder[AsofOut]
    sorted.foreach { r =>
      if (r.is_build) {
        if (last.forall(s =>
            s.ts_us < r.ts_us || (s.ts_us == r.ts_us && s.event_id <= r.event_id)))
          last = Some(BuildState(r.ts_us, r.event_id, r.value, r.tag))
      } else {
        out += AsofOut(r.event_id, key, r.ts_us,
          last.map(_.event_id), last.flatMap(_.value), last.flatMap(_.tag))
      }
    }
    last.foreach(state.update)
    out.result().iterator
  }
}
