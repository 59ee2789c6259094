package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation: two-phase salted combine.
  *
  * A plain `groupBy(key).agg(...)` shuffles every row of a hot key to ONE
  * reducer; at 100 TB a single key holding 1% of the data serializes 1 TB
  * through one task. Salting splits each key into `salt` subkeys, combines
  * partials per (key, salt), then merges the small per-key partials — the
  * hot key's work spreads over `salt` tasks and the second shuffle carries
  * only `|keys| * salt` rows.
  *
  * Spark's AQE skew handling (`spark.sql.adaptive.skewJoin`) covers JOIN
  * skew; aggregation skew is only partially absorbed by partial
  * aggregation (map-side combine) — which degrades when the cardinality
  * within a map task is high (hash map spills). Explicit salting is the
  * deterministic fix. Only ALGEBRAIC aggregates decompose this way
  * (sum/count/min/max and anything built from them); holistic aggregates
  * (exact median) need a different strategy.
  */
object Skew {

  /** Salted sum/count/min/max battery for one value column. Results are
    * decimal-exact for sums (the same per-key partial law flox relies on:
    * a sum of group-sums is the group sum). */
  def saltedAgg(df: DataFrame, key: Seq[String], value: String, salt: Int,
                sumScale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val v = col(value)
    val partial = df
      .withColumn("__salt", pmod(crc32(col(key.head).cast("string")) +
        monotonically_increasing_id(), lit(salt.toLong)))
      .groupBy((key.map(col) :+ col("__salt")): _*)
      .agg(
        sum(v.cast(DecimalType(38, sumScale))).as("__sum"),
        count(when(v.isNotNull, 1)).as("__cnt"),
        min(v).as("__min"),
        max(v).as("__max"))
    partial
      .groupBy(key.map(col): _*)
      .agg(
        sum(col("__sum")).cast("double").as(s"${value}_sum"),
        sum(col("__cnt")).as(s"${value}_count"),
        min(col("__min")).as(s"${value}_min"),
        max(col("__max")).as(s"${value}_max"))
  }
}
