package graft.align

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Last-touch attribution: each conversion event is credited to the most
  * recent touch event of the same user within a lookback tolerance —
  * the marketing-analytics verb built directly on the [[AsOf]] union +
  * partitioned-window machinery (one shuffle on the user key, zero row
  * multiplication — the DuckDB oracle uses its native ASOF JOIN).
  *
  * Determinism: multiple touches at the SAME (user, ts) would make the
  * as-of pick ambiguous across engines, so touches are pre-deduped per
  * key to the max-event-id row — both engines then see a unique
  * observation per instant.
  */
object Attribution {

  /** @param conversions probe side: (by, key, ...valueCols)
    * @param touches     observation side: (by, key, touchType, tieBreak)
    * @param toleranceMicros lookback window; older matches -> credited
    *                        to `noTouchLabel` */
  def lastTouch(conversions: DataFrame, touches: DataFrame,
                by: String, key: String, touchType: String, tieBreak: String,
                toleranceMicros: Long,
                noTouchLabel: String = "(none)"): DataFrame = {
    val obs = touches
      .groupBy(col(by), col(key))
      .agg(max(struct(col(tieBreak), col(touchType))).as("__m"))
      .select(col(by), col(key).as("__touch_key"),
        col("__m").getField(touchType).as("__touch_type"))
      .withColumn(key, col("__touch_key"))
    val joined = AsOf.backward(conversions, obs, Seq(by), key,
      Seq("__touch_type", "__touch_key"))
    AsOf.withTolerance(joined, key, "__touch_key",
      Seq("__touch_type"), toleranceMicros)
      .withColumn("attributed",
        coalesce(col("__touch_type"), lit(noTouchLabel)))
      .drop("__touch_type", "__touch_key")
  }
}
