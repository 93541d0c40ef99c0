/* Bridge package (see HashExpressions.scala): StreamingRelation /
 * DataSource are private[sql], so the plan walk lives in a subpackage
 * of org.apache.spark.sql — the standard extension pattern. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.StreamingRelation

object StreamingInternals {

  /** File paths of every file-based streaming SOURCE in `stream`'s
    * logical plan (empty for memory/rate/socket sources). This is what
    * lets the state-provider choice derive from the query's OWN
    * sources instead of a shared mutable conf: a session-global
    * "last staged source size" is overwritten by whichever staging ran
    * last, so a later run over a different (or unstaged) source would
    * tune its provider from a stale size (ADVICE round 6). */
  def fileSourcePaths(stream: DataFrame): Seq[String] =
    stream.queryExecution.logical.collect {
      case r: StreamingRelation =>
        r.dataSource.paths ++ r.dataSource.options.get("path")
    }.flatten.distinct
}
