package graft

import org.apache.spark.sql.functions._
import graft.model.{DatasetMeta, XDataset}

/** Core model invariants on an F1-style fixture (FIXTURES.md):
  * selection semantics, masking, metadata-only ops. */
class XDatasetSpec extends SparkSpec {
  import spark.implicits._

  private def fixture: XDataset = {
    val df = (for { d1 <- 0L until 4L; d2 <- 0L until 3L }
      yield (d1, d2 * 0.5, (d1 * 3 + d2).toDouble, (d1 + d2).toDouble))
      .toDF("dim1", "dim2", "var1", "var2")
    XDataset(df, dims = Seq("dim1", "dim2"))
  }

  test("sel exact + slice (inclusive both ends, ref dataset.py:3018)") {
    assert(fixture.sel("dim1", Seq(1L, 2L)).df.count() === 6)
    // label slice includes BOTH endpoints unlike positional slicing
    assert(fixture.selSlice("dim2", 0.0, 0.5).df.count() === 8)
  }

  test("isel positional with step") {
    val ds = fixture.isel("dim1", 0, 3, 2, extraOrder = Seq("dim2"))
    // positions 0 and 2 of the 12 (dim1-major) rows
    assert(ds.df.count() === 2)
  }

  test("drop_isel: positional anti-filter (ref dataset.py:6192)") {
    val ds = fixture.dropIsel("dim1", Seq(0L, 5L), extraOrder = Seq("dim2"))
    assert(ds.df.count() === 10)
    // complement of isel at the same positions: together they tile the rows
    val kept = fixture.isel("dim1", 0, 1, extraOrder = Seq("dim2")).df
      .union(fixture.isel("dim1", 5, 6, extraOrder = Seq("dim2")).df)
    assert(ds.df.intersect(kept).count() === 0)
    assert(ds.df.union(kept).distinct().count() === 12)
  }

  test("whereMask keeps shape, nulls masked cells (ref common.py:1131)") {
    val m = fixture.whereMask(col("var1") > 5.0)
    assert(m.df.count() === 12)                       // shape preserved
    assert(m.df.filter(col("var1").isNull).count() === 6)
    assert(m.df.filter(col("dim1").isNull).count() === 0) // keys untouched
  }

  test("transpose/rename are metadata-only (plan unchanged / O(1))") {
    val ds = fixture
    val t = ds.transpose("dim2", "dim1")
    assert(t.df eq ds.df)                             // same DataFrame object
    assert(t.meta.dims === Seq("dim2", "dim1"))
    val r = ds.rename(Map("dim1" -> "x"))
    assert(r.meta.dims === Seq("x", "dim2"))
    assert(r.df.columns.contains("x") && !r.df.columns.contains("dim1"))
  }

  test("dropna/fillna (ref dataset.py:6355/6489)") {
    val masked = fixture.whereMask(col("var1") > 5.0)
    assert(masked.dropna(Seq("var1")).df.count() === 6)
    assert(masked.fillna(0.0).df.filter(col("var1") === 0.0).count() === 6)
  }

  test("reduce over dim subset groups by remaining dims (ref §2.4)") {
    val out = fixture.reduce(Seq("dim2"), Seq(sum(col("var1")).as("s")))
    assert(out.columns.toSet === Set("dim1", "s"))
    assert(out.count() === 4)
    val total = fixture.reduce(Seq("dim1", "dim2"), Seq(sum(col("var1")).as("s")))
    assert(total.head.getDouble(0) === (0 until 12).map(_.toDouble).sum)
  }

  test("squeeze drops size-1 dim; expand_dims crossJoins labels") {
    val e = fixture.expandDims("scenario", Seq(1, 2))
    assert(e.df.count() === 24)
    assert(e.meta.dims === Seq("scenario", "dim1", "dim2"))
    val sq = e.squeeze("scenario")
    assert(sq.meta.dims === Seq("dim1", "dim2"))
  }

  test("mapVars hits data vars only; pipe chains; accessor resolves") {
    import graft.model.Accessors._
    val ds = XDataset(
      Seq((1L, 2.0, 3.0), (2L, 4.0, 5.0)).toDF("k", "a", "b"),
      dims = Seq("k"))
    val doubled = ds.mapVars(_ * 2)
    val r = doubled.df.orderBy("k").collect()
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L)) // keys untouched
    assert(r.map(_.getDouble(1)).toSeq === Seq(4.0, 8.0))
    val n = ds.pipe(d => d.df.count())
    assert(n === 2L)
    val desc = ds.stats.describe().head()
    assert(desc.getAs[Long]("a_count") === 2L)
    assert(desc.getAs[Double]("b_max") === 5.0)
  }

  test("combine_attrs implements the five reference policies") {
    import graft.model.DatasetMeta.combineAttrs
    val a = Map("title" -> "x", "units" -> "m")
    val b = Map("title" -> "x", "source" -> "sat")
    val c = Map("title" -> "y")
    assert(combineAttrs("drop", Seq(a, b)) === Map.empty)
    assert(combineAttrs("override", Seq(a, b)) === a)
    assert(combineAttrs("no_conflicts", Seq(a, b)) ===
      Map("title" -> "x", "units" -> "m", "source" -> "sat"))
    intercept[IllegalArgumentException] { combineAttrs("no_conflicts", Seq(a, c)) }
    assert(combineAttrs("drop_conflicts", Seq(a, c)) === Map("units" -> "m"))
    assert(combineAttrs("identical", Seq(a, a)) === a)
    intercept[IllegalArgumentException] { combineAttrs("identical", Seq(a, b)) }
  }

  test("equals ignores attrs and row order; identical does not") {
    val a = XDataset(Seq((1L, 2.0), (2L, 3.0)).toDF("k", "v"), dims = Seq("k"))
    val shuffled = XDataset(Seq((2L, 3.0), (1L, 2.0)).toDF("k", "v"), dims = Seq("k"))
    val withAttrs = new XDataset(a.df,
      graft.model.DatasetMeta(Seq("k"), attrs = Map("units" -> "m")))
    val different = XDataset(Seq((1L, 2.0), (2L, 9.0)).toDF("k", "v"), dims = Seq("k"))
    assert(a.equalsData(shuffled))
    assert(a.equalsData(withAttrs))       // attrs ignored
    assert(!a.identical(withAttrs))       // but identical sees them
    assert(withAttrs.identical(withAttrs))
    assert(!a.equalsData(different))
  }

  test("drop_attrs / drop_encoding / drop_indexes are metadata-only") {
    val base = new XDataset(Seq((1L, 2.0)).toDF("k", "v"),
      graft.model.DatasetMeta(Seq("k"), attrs = Map("title" -> "t"),
        varAttrs = Map("v" -> Map("units" -> "m", "scale_factor" -> "0.5",
          "_FillValue" -> "-9"))))
      .setXIndex("k", "hash")
    val bare = base.dropAttrs()
    assert(bare.meta.attrs.isEmpty && bare.meta.varAttrs.isEmpty)
    assert(bare.indexes.contains("k")) // indexes survive attr drop
    val shallow = base.dropAttrs(deep = false)
    assert(shallow.meta.attrs.isEmpty &&
      shallow.meta.varAttrs("v")("units") == "m")
    val dec = base.dropEncoding()
    assert(dec.meta.varAttrs("v") == Map("units" -> "m")) // coders gone
    assert(dec.meta.attrs("title") == "t")                // attrs stay
    val noIdx = base.dropIndexes(Seq("k"))
    assert(noIdx.indexes.isEmpty && noIdx.df.columns.contains("k"))
    intercept[IllegalArgumentException](base.dropIndexes(Seq("v")))
    val txt = base.info
    assert(txt.contains("dimensions:") && txt.contains("v:units = m"))
  }
}
