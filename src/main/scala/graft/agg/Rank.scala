package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Positions

/** Distributed rank (ref `dataset.py:8416`; bottleneck `rankdata`
  * average-tie semantics).
  *
  * `rank().over(Window.orderBy(v))` moves ALL data to one partition — fine
  * for the reference's in-memory arrays, wrong at 100 TB. This version
  * builds global ordinals via range-partitioned sort + per-partition
  * offsets ([[Positions.zipWithIndex]]), then resolves ties with a
  * per-value aggregation joined back: rank_avg(x) = mean of (ordinal+1)
  * over the tie group. Two shuffles, no single-task stage.
  */
object Rank {

  /** Attach `outCol` = average-tie rank of `valueCol` (1-based). Pass
    * `pct = true` for rank/n (xarray pct=True). */
  def avgRank(df: DataFrame, valueCol: String, outCol: String,
              pct: Boolean = false): DataFrame = {
    val pos = "__rank_pos"
    val withPos = Positions.zipWithIndex(df, Seq(col(valueCol)), pos)
    val perValue = withPos.groupBy(col(valueCol).as("__rank_v"))
      .agg(avg(col(pos) + 1).as("__rank_avg"))
    val n = if (pct) Some(df.count().toDouble) else None
    val joined = withPos
      .join(perValue, col(valueCol) === col("__rank_v"), "left")
      .drop("__rank_v", pos)
    val out = n match {
      case Some(total) => joined.withColumn(outCol, col("__rank_avg") / total)
      case None        => joined.withColumn(outCol, col("__rank_avg"))
    }
    out.drop("__rank_avg")
  }
}
