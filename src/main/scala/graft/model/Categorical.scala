package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical / dictionary encoding — the engine mapping for pandas
  * Categorical ExtensionArrays (SURVEY.md §1.3; ref
  * `xarray/core/extension_array.py:1-327`, `indexes.py`
  * PandasIndex over CategoricalIndex).
  *
  * A categorical column becomes (code: int, dictionary table
  * code -> label): codes are dense 0..n-1 ordinals in LABEL SORT ORDER
  * (pandas' default lexicographic categories). The dictionary is its own
  * DataFrame — metadata-scale next to the data, so it broadcasts — and
  * every operation on the categorical (groupBy, join, sort) runs on the
  * int code: narrower shuffle keys, dictionary joined back only at the
  * edges. Codes are assigned with [[Positions.zipWithIndex]] ordinals —
  * no global window, so the dictionary build scales with distinct labels,
  * not rows. */
object Categorical {

  /** Build the dictionary table for `labelCol`: (code bigint, label).
    * Null labels are NOT in the dictionary (pandas: NaN is code -1). */
  def dictionary(df: DataFrame, labelCol: String): DataFrame =
    Positions.zipWithIndex(
      df.select(col(labelCol).as("label")).filter(col("label").isNotNull)
        .distinct(),
      Seq(col("label")), "code")
      .select(col("code"), col("label"))

  /** Encode: replace `labelCol` with `code` (bigint; null label -> -1,
    * the pandas NaN code) via a broadcast join against `dict`. */
  def encode(df: DataFrame, labelCol: String, dict: DataFrame,
             codeCol: String = "code"): DataFrame =
    df.join(broadcast(dict.withColumnRenamed("label", labelCol)),
        Seq(labelCol), "left")
      .withColumn("__code", coalesce(col("code"), lit(-1L)))
      .drop("code").drop(labelCol)
      .withColumnRenamed("__code", codeCol)

  /** Decode: join labels back (code -1 -> null label). */
  def decode(df: DataFrame, dict: DataFrame, codeCol: String,
             labelCol: String): DataFrame =
    df.join(broadcast(dict.withColumnRenamed("code", codeCol)),
        Seq(codeCol), "left")
      .withColumnRenamed("label", labelCol)
      .drop(codeCol)
}
