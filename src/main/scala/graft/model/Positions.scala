package graft.model

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Positional index attachment for `isel` / `head` / `tail` / `thin` / `roll`
  * semantics (SURVEY.md §2.2): xarray selects by POSITION along a dimension
  * (ref `xarray/core/dataset.py:2801` `isel`); the long format has no row
  * order, so positions are derived from the dimension coordinate's sort
  * order.
  *
  * Scale note (100 TB): a naive `row_number() over (orderBy col)` uses ONE
  * window partition — a single-task bottleneck. `zipWithIndex` instead
  * range-partitions by the order columns, sorts within partitions, and
  * assigns contiguous ordinals via per-partition offsets (one extra O(P)
  * count job, no global shuffle to a single node). This is the same
  * partial-offsets scheme Spark's own `RDD.zipWithIndex` uses.
  */
object Positions {

  /** Attach a 0-based `posCol` ordinal ordered by `orderCols` (ties broken by
    * their sort order; pass a unique key suffix for determinism). */
  def zipWithIndex(df: DataFrame, orderCols: Seq[Column], posCol: String): DataFrame = {
    val sorted = df
      .repartitionByRange(math.max(df.sparkSession.sparkContext.defaultParallelism, 1), orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(posCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }

  /** Window-based variant: fine when a partitioning key bounds the window
    * size (e.g. per-group positions); avoid the unpartitioned form at scale. */
  def viaWindow(df: DataFrame, partitionBy: Seq[Column], orderCols: Seq[Column], posCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w =
      if (partitionBy.isEmpty) Window.orderBy(orderCols: _*)
      else Window.partitionBy(partitionBy: _*).orderBy(orderCols: _*)
    df.withColumn(posCol, row_number().over(w).cast(LongType) - 1L)
  }
}
