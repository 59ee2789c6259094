package graft.window

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** BATCH gap-based sessionization — the offline counterpart of
  * [[graft.streaming.StreamOps.sessionize]]: an event `gapSec` OR MORE
  * after its predecessor starts a new session — the exact boundary
  * contract of Spark's `session_window` (end-EXCLUSIVE: a session
  * covers [start, last + gap)), so swapping between the batch and
  * streaming op never changes session counts on boundary events. The
  * classic gaps-and-islands fold: one
  * lag + one running-sum window, both partitioned by the entity key —
  * no global window, no driver state; session stats are a following
  * hash agg on (entity, session). Timestamps compare exactly, so the
  * whole result is integer/timestamp arithmetic — bit-reproducible. */
object Sessions {

  /** Per (entity, session): 1-based `session_seq`, first/last event
    * time, event count, and whole-second duration. */
  def stats(events: DataFrame, entity: String, ts: String,
            gapSec: Long): DataFrame = {
    require(gapSec > 0, s"session gap must be positive, got $gapSec")
    val wOrd = Window.partitionBy(col(entity)).orderBy(col(ts))
    val newSession = when(
      unix_micros(col(ts)) - unix_micros(lag(col(ts), 1).over(wOrd)) >=
        gapSec * 1000000L, 1).otherwise(0)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    events
      .withColumn("__new", newSession)
      .withColumn("session_seq", sum(col("__new")).over(wRun) + 1)
      .groupBy(col(entity), col("session_seq"))
      .agg(min(col(ts)).as("t_start"), max(col(ts)).as("t_end"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_sec",  // exact integral div (Column./ is double)
        expr("(unix_micros(t_end) - unix_micros(t_start)) div 1000000"))
  }
}
