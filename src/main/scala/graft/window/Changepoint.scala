package graft.window

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUSUM changepoint detection over an aggregated integral series —
  * the pipeline-monitoring verb ("when did the corpus mix / revenue /
  * ingest volume shift level?").
  *
  * Statistic: the classic CUSUM mean-shift estimator. With prefix sums
  * S_t over n buckets and the grand total S_n, the cumulative deviation
  * from the fitted flat line is C_t = S_t − (t/n)·S_n; the changepoint
  * estimate is argmax_t |C_t| (the point where the pre/post mean split
  * explains the most). Everything stays EXACT: the statistic is carried
  * denominator-cleared as D_t = |n·S_t − t·S_n| (BIGINT arithmetic
  * widened through DECIMAL(38,0); no division at all), so Spark and any
  * external SQL engine agree bit-for-bit. Ties on D_t break to the
  * earliest bucket.
  *
  * Scale shape: the input is the AGGREGATED series (one row per time
  * bucket — bounded by the calendar, not the data volume), so the
  * unpartitioned prefix window runs over a provably small frame; the
  * grand total and the argmax are 1-row broadcasts.
  */
object Changepoint {

  /** `series`: one row per bucket with integral `valCol` (e.g. cents).
    * Output: bucketCol, valCol, cum (prefix sum), d_stat = |n·S_t − t·S_n|
    * and is_changepoint (true on exactly the argmax row, earliest on
    * ties). */
  def cusum(series: DataFrame, bucketCol: String, valCol: String)
      : DataFrame = {
    val w = Window.orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = series
      .withColumn("cum", sum(col(valCol)).over(w))
      .withColumn("__t", count(lit(1)).over(w))
    val tot = pre.agg(max(col("__t")).as("__n"),
      sum(col(valCol)).cast("decimal(38,0)").as("__tot"))
    val scored = graft.util.QueryCache.persist(pre
      .crossJoin(broadcast(tot))
      .select(col(bucketCol), col(valCol), col("cum"),
        // |n·S_t − t·S_n| on the decimal grid; the cast back to BIGINT
        // is ANSI-loud (a 100 TB caller keeps the decimal column)
        abs(col("__n") * col("cum").cast("decimal(38,0)") -
          col("__t") * col("__tot")).cast("long").as("d_stat")))
    val best = scored.agg(max(col("d_stat")).as("__mx"))
    val flagged = scored.crossJoin(broadcast(best))
      .withColumn("__isMax", col("d_stat") === col("__mx"))
    // earliest-bucket tie-break without a second global window: the min
    // bucket among max-stat rows is itself a 1-row broadcast
    val firstMax = flagged.filter(col("__isMax"))
      .agg(min(col(bucketCol)).as("__cp"))
    flagged.crossJoin(broadcast(firstMax))
      .select(col(bucketCol), col(valCol), col("cum"), col("d_stat"),
        (col(bucketCol) === col("__cp")).as("is_changepoint"))
  }
}
