package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass column profiling — the data-quality summary a pipeline
  * runs before trusting 100 TB of input (null rates, exact distinct
  * counts, ranges per column).
  *
  * Shape: ONE scan explodes each row into (column-id, value) pairs, a
  * first hash aggregate collapses them to distinct values per column
  * (map-side combine shrinks each partition to its local distincts —
  * the shuffle carries distinct values, not rows), and a second
  * aggregate reduces each column's distinct frame to one stats row.
  * Deliberately NOT Spark's multi-countDistinct (whose Expand-based
  * plan measured 3-5x slower here) and no collect: both aggregates are
  * plain codegen HashAggregates.
  *
  * Exactness: numeric ranges land in the column's own integer/decimal
  * grid (the caller pre-grids doubles, e.g. cents), string ranges stay
  * strings — no cross-engine float or timestamp RENDERING ever happens
  * (min/max are emitted in typed columns, not cast to text). */
object Profile {

  /** One spec per profiled column: (name, gridded expression, isNumeric).
    * Numeric specs must already be on an integer/decimal grid. */
  def profile(df: DataFrame,
              specs: Seq[(String, Column, Boolean)]): DataFrame = {
    require(specs.nonEmpty, "profile needs at least one column spec")
    val entries = specs.zipWithIndex.map { case ((_, c, isNum), i) =>
      struct(lit(i).as("i"),
        (if (isNum) c.cast("long") else lit(null).cast("long")).as("vn"),
        (if (isNum) lit(null).cast("string") else c.cast("string"))
          .as("vs"))
    }
    val pairs = df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.i").as("i"), col("e.vn").as("vn"),
        col("e.vs").as("vs"))
    val distincts = pairs.groupBy(col("i"), col("vn"), col("vs"))
      .agg(count(lit(1)).as("cnt"))
    val stats = distincts.groupBy(col("i"))
      .agg(sum(col("cnt")).cast("long").as("n_rows"),
        sum(when(col("vn").isNull && col("vs").isNull, col("cnt"))
          .otherwise(0L)).cast("long").as("n_null"),
        sum(when(col("vn").isNotNull || col("vs").isNotNull, 1L)
          .otherwise(0L)).cast("long").as("n_distinct"),
        min(col("vn")).as("min_num"), max(col("vn")).as("max_num"),
        min(col("vs")).as("min_str"), max(col("vs")).as("max_str"))
    // left-join the literal spec frame so an EMPTY input still reports
    // every profiled column (with zero counts), not an empty frame
    val spark = df.sparkSession
    import spark.implicits._
    val specFrame = specs.map(_._1).zipWithIndex
      .map { case (n, i) => (i, n) }.toDF("i", "column")
    specFrame.join(stats, Seq("i"), "left")
      .select(col("column"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("n_null"), lit(0L)).as("n_null"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
  }
}
