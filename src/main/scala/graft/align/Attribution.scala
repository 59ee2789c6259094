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

  /** Linear (equal-split) multi-touch attribution: every touch inside
    * the conversion's lookback window receives an equal share of the
    * conversion value — the multi-touch complement of [[lastTouch]].
    *
    * The (conversion x touch) candidate set comes from
    * [[IntervalJoin.pointInInterval]]'s time-bucket decomposition, so
    * the range match is an EQUI-join on (user, bucket) — never a
    * nested loop — and its fan-out is bounded by touches-per-window,
    * the rows the answer genuinely needs.
    *
    * Exactness: the per-touch share rides the ppm integer grid —
    * credit_ppm = valueCents·10⁶ div n_touches, the truncating integral
    * division all engines share — so credit sums are exact BIGINTs (a
    * conversion's total credited ppm may undershoot its value by < n
    * ppm: the documented fixed-point remainder, identical everywhere).
    * The sum is widened through DECIMAL(38,0) internally (overflow-safe
    * at any scale) and EMITTED as BIGINT — the output-type contract is
    * BIGINT/DOUBLE/STRING/BOOL/DATE/TIMESTAMP only; a corpus whose total
    * credited ppm exceeds 2⁶³ should re-grid to cents upstream.
    *
    * @param conversions (by, key, convId, valueCents) — valueCents an
    *                    integral column
    * @param touches     (by, key, touchType)
    * @return one row per (attributed touch type + `noTouchLabel`):
    *         n_touch, credit_ppm */
  def linearTouch(conversions: DataFrame, touches: DataFrame,
                  by: String, key: String, convId: String,
                  valueCents: String, touchType: String,
                  lookbackMicros: Long, bucketMicros: Long,
                  noTouchLabel: String = "(none)"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ivs = conversions
      .withColumn("__start",
        expr(s"timestampadd(MICROSECOND, -$lookbackMicros, $key)"))
      .withColumnRenamed(key, "__end")
    val matched = IntervalJoin.pointInInterval(
      touches.select(col(by), col(key), col(touchType)), ivs,
      Seq(by), key, "__start", "__end", bucketMicros)
    val n = matched.groupBy(col(convId)).agg(count(lit(1)).as("__n"))
    val credited = matched.join(n, convId)
      .withColumn("__credit_ppm",
        expr(s"$valueCents * 1000000L div __n"))
      .groupBy(col(touchType).as("attributed"))
      .agg(count(lit(1)).as("n_touch"),
        sum(col("__credit_ppm").cast(DecimalType(38, 0))).cast("long")
          .as("credit_ppm"))
    val untouched = conversions
      .join(matched.select(col(convId)).distinct(), Seq(convId),
        "left_anti")
      .agg(count(lit(1)).as("n_touch"),
        sum((col(valueCents) * lit(1000000L)).cast(DecimalType(38, 0)))
          .cast("long").as("credit_ppm"))
      .select(lit(noTouchLabel).as("attributed"), col("n_touch"),
        col("credit_ppm"))
      .filter(col("n_touch") > 0)
    credited.unionByName(untouched)
  }

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
