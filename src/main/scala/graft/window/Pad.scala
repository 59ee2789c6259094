package graft.window

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edge padding along a positional dim (ref `dataset.py:9054` pad;
  * numpy pad modes). Pad rows are generated from a tiny `sequence()` table
  * and fetch their source value by a mode-specific index mapping joined
  * back to the data — no window over the full data, one broadcast-sized
  * join per side at any scale.
  *
  * Supported modes: constant, edge, reflect (numpy: no edge repeat), wrap.
  */
object Pad {

  /** @param df     input with a dense 0-based `pos` column and value cols
    * @param pos    name of the position column
    * @param n      total size (positions are 0..n-1)
    * @param before / after: pad amounts
    * @return frame with positions -before .. n-1+after and one value column
    *         per mode mapping, named `<valueCol>_<mode>` */
  def pad(df: DataFrame, pos: String, valueCol: String, n: Long,
          before: Int, after: Int, constant: Any = null): DataFrame = {
    val spark = df.sparkSession
    val grid = spark.range(-before.toLong, n + after).toDF(pos)
    val p = col(pos)
    def srcIdx(mode: String): Column = mode match {
      case "constant" => when(p >= 0 && p < n, p)             // else no source
      case "edge"     => least(greatest(p, lit(0L)), lit(n - 1))
      case "reflect"  => // numpy 'reflect': mirror WITHOUT repeating the edge
        when(p < 0, -p).when(p >= n, lit(2 * (n - 1)) - p).otherwise(p)
      case "wrap"     => pmod(p, lit(n))
    }
    val modes = Seq("constant", "edge", "reflect", "wrap")
    val withIdx = modes.foldLeft(grid)((g, m) =>
      g.withColumn(s"__i_$m", srcIdx(m)))
    val src = df.select(col(pos).as("__src_pos"), col(valueCol).as("__src_v"))
    val joined = modes.foldLeft(withIdx) { (g, m) =>
      g.join(src.withColumnRenamed("__src_pos", s"__sp_$m")
          .withColumnRenamed("__src_v", s"${valueCol}_$m"),
        col(s"__i_$m") === col(s"__sp_$m"), "left")
        .drop(s"__i_$m", s"__sp_$m")
    }
    val filled =
      if (constant == null) joined
      else joined.withColumn(s"${valueCol}_constant",
        coalesce(col(s"${valueCol}_constant"), lit(constant)))
    filled
  }

  /** Stat / ramp pad modes (numpy maximum / minimum / mean / linear_ramp
    * with end_value=0; stat length = whole series, the numpy default).
    * The series stats aggregate ONCE (decimal-exact mean) and broadcast
    * into the generated pad rows — still no window over the data. */
  def padStat(df: DataFrame, pos: String, valueCol: String, n: Long,
              before: Int, after: Int, meanScale: Int = 6): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val spark = df.sparkSession
    val grid = spark.range(-before.toLong, n + after).toDF(pos)
    val p = col(pos)
    val v = col(valueCol)
    val stats = df.agg(
      max(v).as("__max"), min(v).as("__min"),
      (sum(v.cast(DecimalType(30, meanScale))).cast("double") / count(v))
        .as("__mean"),
      max(when(col(pos) === 0, v)).as("__first"),
      max(when(col(pos) === n - 1, v)).as("__last"))
    val joined = grid
      .join(df.select(col(pos), v), Seq(pos), "left")
      .crossJoin(broadcast(stats))
    val ramp =
      when(p < 0,
        col("__first") * ((lit(before.toDouble) + p) / lit(before.toDouble)))
        .when(p > n - 1,
          col("__last") * ((lit(after.toDouble) - (p - lit(n - 1)))
            / lit(after.toDouble)))
        .otherwise(v)
    joined.select(p,
      coalesce(v, col("__max")).as(s"${valueCol}_maximum"),
      coalesce(v, col("__min")).as(s"${valueCol}_minimum"),
      coalesce(v, col("__mean")).as(s"${valueCol}_mean"),
      ramp.as(s"${valueCol}_linear_ramp"))
  }

  /** roll: circular shift of values by `shift` along pos (ref
    * `dataset.py:8038`): value at pos comes from (pos - shift) mod n. */
  def roll(df: DataFrame, pos: String, valueCol: String, n: Long,
           shift: Int): DataFrame = {
    val src = df.select(col(pos).as("__src_pos"), col(valueCol).as(s"${valueCol}_rolled"))
    df.withColumn("__from", pmod(col(pos) - shift, lit(n)))
      .join(src, col("__from") === col("__src_pos"))
      .drop("__from", "__src_pos")
  }
}
