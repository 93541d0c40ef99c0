package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary-stateful completion tracking (SURVEY A3/K4): the
  * reference's packing thread fires when all `numTracklets` tracklet
  * dirs of a task are present (`vpe/data/DataManagingApp.java:298-325`,
  * count check) and is idempotent (har-exists short-circuit).
  *
  * Spark-native form: `flatMapGroupsWithState` keyed on the task id.
  * State = set of saved serials; a PackJob row is emitted exactly once,
  * in the micro-batch where the last missing serial arrives —
  * batch-split-invariant and idempotent, like the reference.
  *
  * State is TTL-bounded in the production form ([[completionJobsTtl]],
  * event-time timeout): a task whose saves stop arriving (a lost
  * tracklet, a crashed writer) would otherwise pin its serial set in
  * the state store FOREVER — at 100 TB the store only stays bounded if
  * abandoned keys expire, the same reason the reference caps its
  * kill-list LRU at 100 entries (`vpe/ctrl/TaskController.java:36-88`).
  * Event time (not processing time) drives expiry so the bound is
  * deterministic under replay/backfill and a processing stall can't
  * mass-expire live tasks. Each save re-arms the task's timer; a save
  * arriving after expiry re-opens the task from empty state (it can
  * re-fire the PackJob — the pack sink is idempotent, like the
  * reference's har-exists short-circuit).
  */
object CompletionCounter {

  case class SaveEvent(task_id: String, serial: Int, num_tracklets: Int)

  /** Save event with its event-time stamp (the TTL'd path's input; the
    * stream must carry `withWatermark` on `ts`). */
  case class SaveEventTs(task_id: String, serial: Int, num_tracklets: Int,
                         ts: java.sql.Timestamp)

  case class PackJob(task_id: String, n_saved: Int)
  case class SeenState(serials: Set[Int], emitted: Boolean)

  /** Default abandoned-task TTL: generous vs. any real inter-save gap,
    * tiny vs. unbounded. */
  val DefaultStateTtlMs: Long = 30L * 60 * 1000

  /** Shared transition: fold a batch of serials into the seen-set,
    * fire exactly once when the set completes. */
  private def fold(taskId: String, rows: Iterator[SaveEvent],
                   state: GroupState[SeenState]): Iterator[PackJob] = {
    val prev = state.getOption.getOrElse(SeenState(Set.empty, emitted = false))
    var expected = -1
    var serials = prev.serials
    rows.foreach { r => serials += r.serial; expected = r.num_tracklets }
    val complete = expected > 0 && serials.size >= expected
    val fireNow = complete && !prev.emitted
    state.update(SeenState(serials, prev.emitted || fireNow))
    if (fireNow) Iterator(PackJob(taskId, serials.size)) else Iterator.empty
  }

  /** Unbounded-state form — only for inputs whose key space is known
    * bounded (tests, single-batch replays). Streaming deployments use
    * [[completionJobsTtl]]: NoTimeout state is never reclaimed, so on
    * an unbounded task-id space this form leaks state-store rows
    * forever. Deprecated + graft-private so no production call site
    * can pick it by accident. */
  @deprecated("NoTimeout state never expires; use completionJobsTtl", "round-4")
  private[graft] def completionJobs(saves: Dataset[SaveEvent]): Dataset[PackJob] = {
    import saves.sparkSession.implicits._
    saves
      .groupByKey(_.task_id)
      .flatMapGroupsWithState[SeenState, PackJob](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(fold)
  }

  /** TTL-bounded completion counter (the production path): state for a
    * task expires once the watermark passes its last activity + TTL.
    * `saves` must carry a watermark on `ts` (EventTimeTimeout
    * requirement). */
  def completionJobsTtl(saves: Dataset[SaveEventTs],
                        stateTtlMs: Long = DefaultStateTtlMs): Dataset[PackJob] = {
    require(stateTtlMs > 0, "stateTtlMs must be positive")
    import saves.sparkSession.implicits._
    saves
      .groupByKey(_.task_id)
      .flatMapGroupsWithState[SeenState, PackJob](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (taskId: String, rows: Iterator[SaveEventTs], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            // abandoned task: drop its serial set from the state store
            state.remove()
            Iterator.empty
          } else {
            var maxTs = 0L
            val plain = rows.map { r =>
              maxTs = math.max(maxTs, r.ts.getTime)
              SaveEvent(r.task_id, r.serial, r.num_tracklets)
            }
            val out = fold(taskId, plain, state)
            // re-arm from the later of batch activity and the watermark
            // (a timeout timestamp must sit strictly ahead of the wm)
            state.setTimeoutTimestamp(
              math.max(maxTs, state.getCurrentWatermarkMs()) + stateTtlMs)
            out
          }
      }
  }
}
