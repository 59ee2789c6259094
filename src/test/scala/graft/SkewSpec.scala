package graft

import org.apache.spark.sql.functions._
import graft.agg.Skew

/** Salted two-phase aggregation must agree with the direct aggregation
  * regardless of how rows were split across salt buckets (the algebraic
  * combine law) — including on a heavily skewed key. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted agg equals direct agg on a skewed key distribution") {
    // key 0 holds 90% of rows (the hot key)
    val rows = (1 to 9000).map(i => (0L, i.toDouble)) ++
      (1 to 1000).map(i => ((i % 7 + 1).toLong, i * 0.5))
    val df = rows.toDF("k", "v").repartition(8)
    val salted = Skew.saltedAgg(df, Seq("k"), "v", salt = 16)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val direct = df.groupBy("k").agg(
      sum(col("v").cast(org.apache.spark.sql.types.DecimalType(38, 6)))
        .cast("double").as("s"),
      count(when(col("v").isNotNull, 1)).as("c"),
      min("v"), max("v"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted.keySet === direct.keySet)
    salted.keys.foreach { k =>
      assert(salted(k) === direct(k), s"key $k: ${salted(k)} vs ${direct(k)}")
    }
    // the partial stage really fans the hot key out across salt buckets
    val partials = df
      .withColumn("__salt", pmod(crc32(col("k").cast("string")) +
        monotonically_increasing_id(), lit(16L)))
      .filter(col("k") === 0).select("__salt").distinct().count()
    assert(partials > 8, s"hot key only hit $partials salt buckets")
  }
}
