package graft.window

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Additive seasonal decomposition (the classic decompose() shape:
  * series = trend + seasonal + residual) on an EXACT integer grid.
  *
  * Exactness contract: the input value is an integer (e.g. cents) and
  * every output stays integral — trend is carried as `trend_xP` = P *
  * trend (the centered moving SUM, not the mean), the detrended series
  * as P*value - trend_xP, and the per-phase seasonal as a truncating
  * integral division (Spark `div` == DuckDB `//`, toward zero for both
  * signs) — so no engine pair can diverge on float division or
  * half-even rounding. Callers wanting real units divide by P at the
  * edge.
  *
  * Scale shape: the moving sum runs over the AGGREGATED series (one row
  * per time bucket — bounded by the calendar, not the data), so the
  * unpartitioned window is over a provably small frame; the phase means
  * are a P-row broadcast. Rows whose centered window is short (the P/2
  * edges) are dropped, as decompose() does.
  */
object Seasonal {

  /** `series`: one row per time bucket with integral `valCol`.
    * `phaseCol`: the season index of each bucket (e.g. weekday).
    * Output: timeCol, phaseCol, valCol, trend_xP, seas_xP, resid_xP. */
  def decomposeAdditive(series: DataFrame, timeCol: String, valCol: String,
                        phaseCol: String, period: Int): DataFrame = {
    require(period >= 2 && period % 2 == 1,
      s"decomposeAdditive wants an odd period >= 3 (centered window), " +
        s"got $period")
    val half = period / 2
    val w = Window.orderBy(col(timeCol)).rowsBetween(-half, half)
    val t = series
      .withColumn("__cnt", count(lit(1)).over(w))
      .withColumn("trend_xp", sum(col(valCol)).over(w))
      .filter(col("__cnt") === period)
      .withColumn("__detr",
        lit(period.toLong) * col(valCol) - col("trend_xp"))
    val seas = t.groupBy(phaseCol)
      .agg(sum(col("__detr")).as("__snum"), count(lit(1)).as("__sden"))
    t.join(broadcast(seas), phaseCol)
      .withColumn("seas_xp", expr("__snum div __sden"))
      .select(col(timeCol), col(phaseCol), col(valCol), col("trend_xp"),
        col("seas_xp"), (col("__detr") - col("seas_xp")).as("resid_xp"))
  }
}
