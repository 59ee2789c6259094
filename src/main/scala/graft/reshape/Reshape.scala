package graft.reshape

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reshape / combine vocabulary (SURVEY.md §2.7-2.8): concat,
  * stack/unstack (MultiIndex as a struct column), melt/pivot
  * (to_stacked_array / to_unstacked_dataset), expand_dims.
  *
  * All are shuffle-free except pivot/unstack-full (one hash aggregation) —
  * matching the reference's O(1)-metadata intent where possible.
  */
object Reshape {

  /** concat along a NEW dim: each input gets a literal label on the new key
    * column, then unionByName (ref `structure/concat.py:45`). Spark unions
    * are metadata-only — no shuffle, partitions append. */
  def concatNewDim(dim: String, parts: Seq[(Any, DataFrame)]): DataFrame =
    parts.map { case (label, df) => df.withColumn(dim, lit(label)) }
      .reduce(_ unionByName _)

  /** concat along an EXISTING dim: plain union; label disjointness is the
    * caller's contract, as in xarray (ref `concat.py` existing-dim path). */
  def concatExisting(parts: Seq[DataFrame]): DataFrame =
    parts.reduce(_ unionByName _)

  /** stack k dims into one MultiIndex dim = pack key columns into a struct
    * (ref `dataset.py:5333` `_stack_once`; `PandasMultiIndex.stack`
    * `indexes.py:1103`). Metadata-only: no data movement. */
  def stack(df: DataFrame, dims: Seq[String], stacked: String): DataFrame =
    df.withColumn(stacked, struct(dims.map(col): _*)).drop(dims: _*)

  /** unstack the struct back to key columns (ref `dataset.py:5597` fast
    * path `_unstack_once`). */
  def unstack(df: DataFrame, stacked: String): DataFrame = {
    val fields = df.schema(stacked).dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    fields.foldLeft(df)((d, f) => d.withColumn(f, col(stacked).getField(f)))
      .drop(stacked)
  }

  /** sel on ONE level of a stacked (struct / MultiIndex) dim (ref
    * `indexes.py:1291` `PandasMultiIndex.sel` partial-level selection):
    * filter on the struct field; with `drop=true` the selected (now
    * scalar) level is removed from the struct, mirroring pandas' level
    * collapse on scalar selection. Pure filter + projection. */
  def selLevel(df: DataFrame, stacked: String, level: String, value: Any,
               drop: Boolean = false): DataFrame = {
    val filtered = df.filter(col(stacked).getField(level) === lit(value))
    if (!drop) filtered
    else {
      val remaining = df.schema(stacked).dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType]
        .fieldNames.filterNot(_ == level)
      filtered.withColumn(stacked,
        struct(remaining.map(f => col(stacked).getField(f).as(f)).toSeq: _*))
    }
  }

  /** reorder_levels: rebuild the MultiIndex struct with levels in a new
    * order (ref `dataset.py:5270`) — a pure projection, no data motion. */
  def reorderLevels(df: DataFrame, stacked: String, order: Seq[String]): DataFrame = {
    val have = df.schema(stacked).dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSet
    require(order.toSet == have, s"reorder_levels($order) != levels $have")
    df.withColumn(stacked,
      struct(order.map(f => col(stacked).getField(f).as(f)): _*))
  }

  /** unstack a dim into value COLUMNS (xarray unstack to wide form):
    * groupBy + pivot over the known label set. Labels must be provided —
    * at 100 TB an unknown-label pivot needs an extra distinct pass. */
  def unstackPivot(df: DataFrame, keepDims: Seq[String], unstackDim: String,
                   labels: Seq[String], valueAgg: Column): DataFrame =
    df.groupBy(keepDims.map(col): _*)
      .pivot(unstackDim, labels)
      .agg(valueAgg)

  /** to_stacked_array / melt: fold variable columns into (variable, value)
    * rows (ref `dataset.py:5383`). Uses the codegen'd `stack` expression —
    * a projection, not a shuffle. */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
           varName: String = "variable", valueName: String = "value"): DataFrame = {
    val stackArgs = valueCols.map(c => s"'$c', `$c`").mkString(", ")
    df.selectExpr(idCols.map(c => s"`$c`") :+
      s"stack(${valueCols.size}, $stackArgs) AS ($varName, $valueName)": _*)
  }

  /** to_unstacked_dataset / pivot back from melted form. */
  def unmelt(df: DataFrame, idCols: Seq[String], varCol: String,
             valueCol: String, vars: Seq[String]): DataFrame =
    df.groupBy(idCols.map(col): _*).pivot(varCol, vars).agg(first(col(valueCol)))
}
