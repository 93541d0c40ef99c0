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
  */
object CompletionCounter {

  case class SaveEvent(task_id: String, serial: Int, num_tracklets: Int)
  case class PackJob(task_id: String, n_saved: Int)
  case class SeenState(serials: Set[Int], emitted: Boolean)

  def completionJobs(saves: Dataset[SaveEvent]): Dataset[PackJob] = {
    import saves.sparkSession.implicits._
    saves
      .groupByKey(_.task_id)
      .flatMapGroupsWithState[SeenState, PackJob](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (taskId: String, rows: Iterator[SaveEvent], state: GroupState[SeenState]) =>
          val prev = state.getOption.getOrElse(SeenState(Set.empty, emitted = false))
          var expected = -1
          var serials = prev.serials
          rows.foreach { r => serials += r.serial; expected = r.num_tracklets }
          val complete = expected > 0 && serials.size >= expected
          val fireNow = complete && !prev.emitted
          state.update(SeenState(serials, prev.emitted || fireNow))
          if (fireNow) Iterator(PackJob(taskId, serials.size)) else Iterator.empty
      }
  }
}
