package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Custom Index plug-in point — the reference's `set_xindex`
  * (ref `xarray/core/dataset.py:4954` set_xindex; `core/indexes.py:78`
  * Index base class with `sel`/`create_variables` hooks).
  *
  * In the reference an Index owns label→position translation. In the Spark
  * encoding there are no positions to own — labels ARE the key columns —
  * so an index here owns two things that matter at 100 TB instead:
  * (a) `build`, a physical LAYOUT applied once (range partitioning,
  * sort-within-partitions) so parquet row-group stats and partition pruning
  * make label lookups near-free, and (b) `sel`, the predicate strategy a
  * label lookup compiles to. `XDataset.sel` dispatches through the attached
  * index when one exists.
  */
trait XIndex {
  /** One-time layout pass when the index is attached; default no-op. */
  def build(df: DataFrame, dim: String): DataFrame = df
  /** Compile a label lookup into a filtered frame. */
  def sel(df: DataFrame, dim: String, values: Seq[Any]): DataFrame
  /** Compile a label-slice lookup (inclusive both ends, xarray slice). */
  def selSlice(df: DataFrame, dim: String, lo: Any, hi: Any): DataFrame =
    df.filter(col(dim).between(lit(lo), lit(hi)))
}

object XIndexes {

  /** Default: plain IN predicate — Catalyst pushes it to the scan. */
  object HashIndex extends XIndex {
    def sel(df: DataFrame, dim: String, values: Seq[Any]): DataFrame =
      df.filter(col(dim).isin(values: _*))
  }

  /** Range layout: rows range-partitioned and sorted on the dim. After a
    * parquet write, min/max row-group stats line up with the dim, so both
    * `sel` points and `selSlice` ranges skip almost all data at scale. */
  final class RangeIndex(partitions: Int = 0) extends XIndex {
    override def build(df: DataFrame, dim: String): DataFrame = {
      val ranged =
        if (partitions > 0) df.repartitionByRange(partitions, col(dim))
        else df.repartitionByRange(col(dim))
      ranged.sortWithinPartitions(col(dim))
    }
    def sel(df: DataFrame, dim: String, values: Seq[Any]): DataFrame =
      df.filter(col(dim).isin(values: _*))
  }

  /** xarray.indexes.RangeIndex analog (ref `indexes/range_index.py:144`):
    * an evenly-spaced float coordinate that is NEVER materialized. The
    * stored dim column holds integer positions (`spark.range` — a virtual
    * axis with no storage at all); labels derive as start + pos*step on
    * demand, and label lookups compile to pure position arithmetic that
    * pushes down on the long column. sel uses the nearest-position
    * contract of the reference; selSlice keeps xarray's inclusive-ends
    * label-slice semantics. */
  final class AffineRangeIndex(val start: Double, val step: Double)
      extends XIndex {
    require(step != 0.0, "step must be nonzero")
    private def posOf(v: Any): Double =
      (v.toString.toDouble - start) / step
    /** Derive the float label column from the stored position column. */
    def label(posCol: Column): Column =
      lit(start) + posCol.cast("double") * lit(step)
    def sel(df: DataFrame, dim: String, values: Seq[Any]): DataFrame = {
      val ps = values.map(v => math.round(posOf(v)))
      df.filter(col(dim).isin(ps: _*))
    }
    override def selSlice(df: DataFrame, dim: String,
                          lo: Any, hi: Any): DataFrame = {
      val (a, b) = (posOf(lo), posOf(hi))
      val (l, h) = if (step > 0) (a, b) else (b, a)
      df.filter(col(dim).between(
        lit(math.ceil(l).toLong), lit(math.floor(h).toLong)))
    }
  }

  object AffineRangeIndex {
    /** arange (ref `range_index.py` RangeIndex.arange): a dataset whose
      * only content is the virtual axis — `spark.range` scans nothing. */
    def arange(spark: org.apache.spark.sql.SparkSession, start: Double,
               stop: Double, step: Double, dim: String): XDataset = {
      val n = math.max(0L, math.ceil((stop - start) / step).toLong)
      new XDataset(spark.range(n).toDF(dim), DatasetMeta(Seq(dim)))
        .setXIndex(dim, new AffineRangeIndex(start, step))
    }

    /** linspace (ref `range_index.py` RangeIndex.linspace): `num` evenly
      * spaced labels from start to stop inclusive. */
    def linspace(spark: org.apache.spark.sql.SparkSession, start: Double,
                 stop: Double, num: Long, dim: String): XDataset = {
      require(num >= 2, s"linspace needs num >= 2, got $num")
      new XDataset(spark.range(num).toDF(dim), DatasetMeta(Seq(dim)))
        .setXIndex(dim, new AffineRangeIndex(start, (stop - start) / (num - 1)))
    }
  }

  // ---- plug-in registry (ref `set_xindex(index_cls)`) --------------------
  @volatile private var registry: Map[String, () => XIndex] = Map(
    "hash" -> (() => HashIndex),
    "range" -> (() => new RangeIndex()))

  def register(name: String, factory: () => XIndex): Unit = synchronized {
    registry = registry + (name -> factory)
  }

  def create(name: String): XIndex =
    registry.getOrElse(name, throw new IllegalArgumentException(
      s"unknown index '$name'; registered: ${registry.keys.toSeq.sorted.mkString(", ")}"))()

  def names: Seq[String] = registry.keys.toSeq.sorted
}
