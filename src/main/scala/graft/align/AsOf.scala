package graft.align

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (nearest/ffill/bfill ± tolerance) join — the reference's
  * `sel(method=...)` / `reindex(method=...)` semantics
  * (`core/indexes.py:634` `get_indexer_nd` → pandas `get_indexer(method,
  * tolerance)`). Spark has no asof-join operator; a cross/range join would
  * explode, so this uses the UNION + ordered-window trick:
  *
  *   union left probes and right observations on (by, key), sort by key
  *   within each `by` partition, and `last(value, ignoreNulls)` propagates
  *   the most recent observation to each probe row.
  *
  * One shuffle on `by`, sort-based window, no row multiplication — this is
  * the scalable plan at 100 TB (observations and probes co-partitioned).
  */
object AsOf {

  /** Backward (ffill) as-of: for each left row, latest right row with
    * rightKey <= leftKey (inclusive), matching DuckDB `ASOF JOIN ... ON
    * l.k >= r.k`.
    *
    * @param left      probe side
    * @param right     observation side
    * @param by        equi-join keys (partitioning)
    * @param key       ordering column name (present in both)
    * @param rightVals observation columns to bring over
    */
  /** Apply a tolerance AFTER an as-of pass: matches farther than
    * `tolerance` (in the key's units; micros for timestamps) are nulled,
    * mirroring pandas/xarray `sel(method=..., tolerance=...)`. The matched
    * key must be carried in `matchedKeyCol`. */
  def withTolerance(joined: DataFrame, key: String, matchedKeyCol: String,
                    valueCols: Seq[String], tolerance: Long): DataFrame = {
    import org.apache.spark.sql.types.TimestampType
    def toL(c: Column) =
      if (joined.schema(key).dataType == TimestampType) unix_micros(c)
      else c.cast("long")
    val ok = abs(toL(col(key)) - toL(col(matchedKeyCol))) <= tolerance
    valueCols.foldLeft(joined)((d, v) =>
      d.withColumn(v, when(ok, col(v))))
  }

  def backward(left: DataFrame, right: DataFrame, by: Seq[String], key: String,
               rightVals: Seq[String]): DataFrame = {
    val marker = "__is_probe"
    val leftCols = left.columns.toSeq
    val l = left.withColumn(marker, lit(1))
      .select((by :+ key).map(col) ++ Seq(col(marker)) ++
        rightVals.map(v => lit(null).cast(right.schema(v).dataType).as(v)) ++
        leftCols.filterNot(c => by.contains(c) || c == key).map(col): _*)
    val r = right.withColumn(marker, lit(0))
      .select((by :+ key).map(col) ++ Seq(col(marker)) ++ rightVals.map(col) ++
        leftCols.filterNot(c => by.contains(c) || c == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // At equal key, observations (marker=0) sort before probes (marker=1),
    // so an exact-key observation IS visible to the probe (inclusive <=).
    val w = Window.partitionBy(by.map(col): _*).orderBy(col(key), col(marker))
      .rowsBetween(Window.unboundedPreceding, 0)
    fillStruct(l.unionByName(r), marker, rightVals, w)
  }

  /** Carry ALL rightVals from the SAME matched observation: fill one struct
    * (non-null exactly on observation rows) with last(ignoreNulls), then
    * unpack — a genuinely-NULL column in the matched row stays NULL instead
    * of leaking an older observation's value. */
  private def fillStruct(unioned: DataFrame, marker: String,
                         rightVals: Seq[String],
                         w: org.apache.spark.sql.expressions.WindowSpec)
      : DataFrame = {
    val obs = "__obs"
    val filled = unioned
      .withColumn(obs, when(col(marker) === 0,
        struct(rightVals.map(col): _*)))
      .withColumn(obs, last(col(obs), ignoreNulls = true).over(w))
    rightVals.foldLeft(filled)((d, v) =>
      d.withColumn(v, col(obs).getField(v)))
      .filter(col(marker) === 1).drop(marker, obs)
  }

  /** Forward (bfill) as-of: earliest right row with rightKey >= leftKey. */
  def forward(left: DataFrame, right: DataFrame, by: Seq[String], key: String,
              rightVals: Seq[String]): DataFrame = {
    val marker = "__is_probe"
    val leftCols = left.columns.toSeq
    val l = left.withColumn(marker, lit(1))
      .select((by :+ key).map(col) ++ Seq(col(marker)) ++
        rightVals.map(v => lit(null).cast(right.schema(v).dataType).as(v)) ++
        leftCols.filterNot(c => by.contains(c) || c == key).map(col): _*)
    val r = right.withColumn(marker, lit(0))
      .select((by :+ key).map(col) ++ Seq(col(marker)) ++ rightVals.map(col) ++
        leftCols.filterNot(c => by.contains(c) || c == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col(key).desc, col(marker))
      .rowsBetween(Window.unboundedPreceding, 0)
    fillStruct(l.unionByName(r), marker, rightVals, w)
  }
}
