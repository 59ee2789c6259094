package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The full SURVEY.md §1.5 Dataset encoding: variables sharing a dim
  * signature live in ONE table; a Dataset with several signatures is a
  * CATALOG of tables plus the shared dim namespace (ref
  * `xarray/core/dataset.py:202` — dict of Variables over one dim space;
  * dim-size consistency checked at merge, `structure/merge.py:85`).
  *
  * Cross-signature ops resolve through the shared dims: selecting along a
  * dim filters every table that carries it; a binary op between variables
  * from different groups joins on the shared dims (= xarray broadcasting).
  */
final class MultiDataset(val groups: Map[Seq[String], XDataset]) {

  def dims: Seq[String] = groups.keys.flatten.toSeq.distinct.sorted

  def dataVars: Map[String, Seq[String]] =
    groups.map { case (sig, ds) => sig.mkString(",") -> ds.dataVars }

  /** The table that holds `variable`, as a 1-signature dataset. */
  def variable(name: String): XDataset = {
    val (sig, ds) = groups.find(_._2.dataVars.contains(name))
      .getOrElse(throw new NoSuchElementException(s"variable $name"))
    new XDataset(ds.df.select((sig :+ name).map(col): _*), ds.meta)
  }

  /** sel along a dim applies to every group carrying that dim; groups
    * without it are untouched (xarray: selection only affects variables
    * using the dim). */
  def sel(dim: String, values: Seq[Any]): MultiDataset =
    new MultiDataset(groups.map { case (sig, ds) =>
      sig -> (if (sig.contains(dim)) ds.sel(dim, values) else ds)
    })

  /** Binary op between two variables (possibly from different signature
    * groups): inner-join on the SHARED dims — non-shared dims broadcast by
    * row multiplication, exactly xarray's dim-union semantics
    * (`variable.py:2447`). */
  def binaryOp(varA: String, varB: String, out: String)
              (op: (Column, Column) => Column): DataFrame = {
    val a = variable(varA); val b = variable(varB)
    val shared = a.meta.dims.filter(b.meta.dims.contains)
    val joined =
      if (shared.isEmpty) a.df.crossJoin(b.df)
      else a.df.join(b.df, shared)
    val outDims = (a.meta.dims ++ b.meta.dims).distinct
    joined.select(outDims.map(col) :+ op(col(varA), col(varB)).as(out): _*)
  }

  /** merge another dataset's groups in (variables union; same-signature
    * tables outer-join on their dims — ref `structure/merge.py:855`).
    * Scalar groups (empty signature, single row) combine by cross join. */
  def merge(other: MultiDataset): MultiDataset = {
    val keys = groups.keySet ++ other.groups.keySet
    new MultiDataset(keys.map { sig =>
      (groups.get(sig), other.groups.get(sig)) match {
        case (Some(a), Some(b)) =>
          val joined = if (sig.isEmpty) a.df.crossJoin(b.df)
            else a.df.join(b.df, sig, "full_outer")
          sig -> new XDataset(joined, a.meta)
        case (Some(a), None) => sig -> a
        case (None, Some(b)) => sig -> b
        case _ => throw new IllegalStateException
      }
    }.toMap)
  }

  /** Reduce `dim` away across the whole dataset (ref `dataset.py` reduce:
    * `ds.sum(dim=...)` applies to every variable carrying the dim; others
    * pass through unchanged). Each carrying table aggregates in ONE
    * partial+final hash agg over its remaining dims; results that land on
    * an existing signature merge into that table. */
  def reduce(dim: String, agg: Column => Column): MultiDataset = {
    val parts = groups.toSeq.map { case (sig, ds) =>
      if (!sig.contains(dim)) new MultiDataset(Map(sig -> ds))
      else {
        val rest = sig.filterNot(_ == dim)
        val aggs = ds.dataVars.map(v => agg(col(v)).as(v))
        val out =
          if (rest.isEmpty) ds.df.agg(aggs.head, aggs.tail: _*)
          else ds.df.groupBy(rest.map(col): _*).agg(aggs.head, aggs.tail: _*)
        new MultiDataset(Map(rest -> XDataset(out, rest)))
      }
    }
    parts.reduce(_ merge _)
  }

  /** groupby over a coordinate variable (ref `dataset.py` groupby with a
    * non-dim coord, e.g. `ds.groupby("label").sum()`): every table that
    * carries ALL of the coord's dims joins the (small) coord table — a
    * broadcast-able dimension join — and aggregates those dims away,
    * keyed by the coord value plus its other dims. Tables missing the
    * coord's dims are dropped, matching the reference. */
  def groupByCoord(coordVar: String, agg: Column => Column): MultiDataset = {
    val coordDs = variable(coordVar)
    val sc = coordDs.meta.dims
    val parts = groups.toSeq.flatMap { case (sig, ds) =>
      if (!sc.forall(sig.contains) || ds.dataVars.contains(coordVar)) None
      else {
        val rest = sig.filterNot(sc.contains)
        val keys = coordVar +: rest
        val joined = ds.df.join(broadcast(coordDs.df), sc)
        val aggs = ds.dataVars.map(v => agg(col(v)).as(v))
        Some(new MultiDataset(Map(keys ->
          XDataset(joined.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*),
            keys))))
      }
    }
    parts.reduce(_ merge _)
  }
}

object MultiDataset {
  /** Build from (dims -> DataFrame) pairs; dims define each signature. */
  def apply(entries: (Seq[String], DataFrame)*): MultiDataset =
    new MultiDataset(entries.map { case (sig, df) =>
      sig -> XDataset(df, dims = sig)
    }.toMap)
}
