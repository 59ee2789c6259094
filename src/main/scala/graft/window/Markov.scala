package graft.window

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** First-order Markov transition matrix over per-entity event sequences —
  * the user-journey / clickstream summary next to [[Funnel]] and
  * [[Sessions]]: within each entity's (ts, tiebreak)-ordered stream,
  * count `type -> next type` transitions and report each row's exact-ppm
  * share of its source state's outgoing mass. One per-entity lag window
  * + one hash agg on the (from, to) pair (|types|² groups); probabilities
  * are integer floor division — no float rounding convention anywhere. */
object Markov {

  def transitions(events: DataFrame, entity: String, ts: String,
                  typeCol: String, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(col(ts), tiebreak)
    val pairs = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("__tot"))
    pairs.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 1000000 div __tot").as("p_ppm"))
  }
}
