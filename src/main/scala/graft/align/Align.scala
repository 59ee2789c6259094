package graft.align

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.XDataset

/** Label alignment — the reference's implicit-join engine
  * (`xarray/structure/alignment.py:763` `align`; `Aligner` state machine at
  * `:143`). Every multi-object xarray op equi-joins on index labels first;
  * in the long format that is literally a Spark join on the dimension key
  * columns, so Catalyst/AQE pick broadcast vs sort-merge and handle skew.
  *
  * Join modes mirror `align(join=...)`: inner/outer/left/right/exact/override.
  */
object Align {

  /** Inner/outer/left/right alignment of two datasets on their shared dims,
    * returning one joined DataFrame with both sides' variables. Non-shared
    * dims multiply rows — exactly xarray's broadcast-by-dim-name
    * (`variable.py:2447` `_binary_op` → dim-union broadcast). */
  def join(a: XDataset, b: XDataset, how: String = "inner"): DataFrame = {
    val shared = a.meta.dims.filter(b.meta.dims.contains)
    val mode = how match {
      case "outer" => "full_outer"
      case other   => other
    }
    if (shared.isEmpty) a.df.crossJoin(b.df)
    else a.df.join(b.df, shared, mode)
  }

  /** join="exact": key sets must match — raises on mismatch like the
    * reference's `AlignmentError`. Runs one distributed anti-join count per
    * side (cheap: keys only, pushed-down projection). */
  def exact(a: XDataset, b: XDataset): DataFrame = {
    val shared = a.meta.dims.filter(b.meta.dims.contains)
    val ka = a.df.select(shared.map(col): _*).distinct()
    val kb = b.df.select(shared.map(col): _*).distinct()
    val extra = ka.except(kb).count() + kb.except(ka).count()
    require(extra == 0, s"align(join='exact'): key sets differ on $shared")
    a.df.join(b.df, shared, "inner")
  }

  /** join="override": keep the LEFT's labels, take the RIGHT's values
    * positionally (sizes must match) — xarray's positional relabel
    * (`alignment.py` override mode). Implemented as a zip on range-
    * partitioned ordinals; one sort-shuffle per side, join on ordinal. */
  def overrideAlign(a: XDataset, b: XDataset, dim: String): DataFrame = {
    val pa = graft.model.Positions.zipWithIndex(a.df, Seq(col(dim)), "__pos")
    val pb = graft.model.Positions.zipWithIndex(
      b.df.withColumnRenamed(dim, s"__${dim}_b"), Seq(col(s"__${dim}_b")), "__pos")
    pa.join(pb, "__pos").drop("__pos", s"__${dim}_b")
  }

  /** Binary op with auto-align (default arithmetic_join="inner",
    * ref `core/options.py:15`; `dataset.py:7783` `_binary_op`). */
  def binaryOp(a: XDataset, b: XDataset, how: String = "inner")
              (op: (DataFrame) => Seq[Column]): DataFrame = {
    val joined = join(a, b, how)
    val shared = a.meta.dims.filter(b.meta.dims.contains)
    joined.select(shared.map(col) ++ op(joined): _*)
  }

  /** reindex: conform `ds` to the label set `target` (one row per wanted
    * label) — a LEFT join FROM the target so missing labels materialize as
    * NULL/fill rows (ref `dataset.py:3546`; kernel `alignment.py:43`). */
  def reindex(target: DataFrame, ds: XDataset, fill: Map[String, Any] = Map.empty): DataFrame = {
    val dim = target.columns.head
    val joined = target.join(ds.df, Seq(dim), "left")
    fill.foldLeft(joined) { case (d, (c, v)) =>
      d.withColumn(c, coalesce(col(c), lit(v)))
    }
  }

  /** reindex_like: conform `ds` to OTHER's label set on `dim` (ref
    * `dataset.py:3704` `reindex_like`) — sugar that extracts the other
    * object's distinct labels, then runs the [[reindex]] LEFT-join kernel.
    * The label extraction is a keys-only distinct (column-pruned scan);
    * everything else is the reindex plan. */
  def reindexLike(ds: XDataset, like: XDataset, dim: String,
                  fill: Map[String, Any] = Map.empty): DataFrame =
    reindex(like.df.select(dim).distinct(), ds, fill)

  /** interp_like: evaluate `series` at OTHER's coordinate labels by linear
    * interpolation (ref `dataset.py:4158` `interp_like` — "Interpolate
    * this object onto the coordinates of another object"). The probe grid
    * is the other object's distinct `t` labels crossed with the series'
    * group keys; the kernel is the bracketing as-of interp join
    * ([[graft.numerics.Numerics.interpLinear]]), so probes outside a
    * group's observed range stay NULL exactly like the reference. */
  def interpLike(series: DataFrame, like: DataFrame, by: Seq[String],
                 t: String, v: String): DataFrame = {
    val grid = like.select(t).distinct()
    val groups = series.select(by.map(col): _*).distinct()
    // groups x labels: both sides are small keys-only distincts; the
    // interp kernel's as-of join does the heavy lifting
    val probes = groups.crossJoin(grid)
    graft.numerics.Numerics.interpLinear(series, probes, by, t, v)
  }

  /** broadcast_like: expand `ds` against OTHER's dim set (ref
    * `dataarray.py:1561` `broadcast_like` → `alignment.py` broadcast):
    * self's rows multiply over the other's extra-dim label grid, values
    * carried unchanged — the same dim-name broadcast join binary ops use,
    * minus any arithmetic. Extra-dim labels are a keys-only distinct. */
  def broadcastLike(ds: XDataset, like: XDataset): DataFrame = {
    val extra = like.meta.dims.filterNot(ds.meta.dims.contains)
    if (extra.isEmpty) ds.df
    else ds.df.crossJoin(like.df.select(extra.map(col): _*).distinct())
  }

  /** merge of two variable sets over the same dim namespace: outer align +
    * per-variable conflict resolution (ref `structure/merge.py:855`).
    * compat="override" keeps the left's value; "no_conflicts" coalesces. */
  def merge(a: XDataset, b: XDataset, how: String = "outer"): DataFrame =
    join(a, b, how)

  /** combine_first: outer align, self wins, other fills the NULL holes
    * (ref `dataset.py:6845`) — `coalesce(self, other)` after the outer join. */
  def combineFirst(a: XDataset, b: XDataset, varPairs: Seq[(String, String, String)]): DataFrame = {
    val joined = join(a, b, "outer")
    val shared = a.meta.dims.filter(b.meta.dims.contains)
    val cols = shared.map(col) ++ varPairs.map { case (va, vb, out) =>
      coalesce(col(va), col(vb)).as(out)
    }
    joined.select(cols: _*)
  }
}
