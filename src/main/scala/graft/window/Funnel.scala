package graft.window

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event log — the product-analytics
  * counterpart of sessionization: for every entity that ENTERS the funnel
  * (has a stage-1 event), the earliest completion time of each stage
  * PREFIX, where stage k must occur STRICTLY AFTER the entity's recorded
  * stage-(k-1) time (the standard "ordered funnel" contract; an earlier
  * purchase does not satisfy a view→purchase funnel).
  *
  * Distributed shape: one conditional-min hash aggregation per stage,
  * chained by equi-joins on the entity key — |stages| wordcount-shaped
  * passes, no window, no per-entity sort, no driver state. Each pass
  * filters the event scan to ONE stage type (predicate reaches the scan)
  * and joins against the previous prefix table, which only shrinks as the
  * funnel deepens. Timestamps compare exactly, so the result is
  * bit-reproducible on any engine.
  */
object Funnel {

  /** @return one row per entity with a stage-1 event: `t_<stage>`
    *         (earliest in-order completion, NULL once the funnel is
    *         abandoned — later stages cascade NULL) and `stages_reached`. */
  def ordered(events: DataFrame, entity: String, ts: String,
              typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages == stages.distinct,
      s"funnel stages must be non-empty and distinct: $stages")
    val base = events.select(col(entity), col(ts), col(typeCol))
    var acc: DataFrame = base.filter(col(typeCol) === stages.head)
      .groupBy(col(entity)).agg(min(col(ts)).as(s"t_${stages.head}"))
    stages.zipWithIndex.drop(1).foreach { case (s, i) =>
      val prev = s"t_${stages(i - 1)}"
      val next = base.filter(col(typeCol) === s)
        .join(acc.select(col(entity), col(prev)), Seq(entity))
        .filter(col(ts) > col(prev))
        .groupBy(col(entity)).agg(min(col(ts)).as(s"t_$s"))
      acc = acc.join(next, Seq(entity), "left")
    }
    val reached = stages.tail
      .map(s => when(col(s"t_$s").isNotNull, 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)
    acc.withColumn("stages_reached", reached)
  }
}
