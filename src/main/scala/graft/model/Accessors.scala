package graft.model

import org.apache.spark.sql.functions._

/** Accessor registration — the reference's
  * `register_dataset_accessor("name")` (ref `xarray/core/extensions.py:55`):
  * third-party namespaces that hang off every Dataset.
  *
  * The idiomatic Scala analog is an implicit value class: importing
  * `Accessors._` (or a user's own equivalent) makes `ds.stats.describe()`
  * resolve with zero runtime registry and zero per-call allocation (value
  * class). Users register a new accessor by shipping their own implicit
  * class — same extension contract, compile-time checked.
  */
object Accessors {

  /** Example accessor: summary statistics namespace (`ds.stats`). */
  implicit final class StatsAccessor(private val ds: XDataset) extends AnyVal {
    def stats: Stats = new Stats(ds)
  }

  final class Stats(ds: XDataset) {
    /** count/mean/min/max per data variable, one aggregation pass. */
    def describe(): org.apache.spark.sql.DataFrame = {
      val aggs = ds.dataVars.flatMap { v =>
        Seq(count(col(v)).as(s"${v}_count"),
          XDataset.exactAvg(col(v)).as(s"${v}_mean"),
          min(col(v)).as(s"${v}_min"), max(col(v)).as(s"${v}_max"))
      }
      ds.df.agg(aggs.head, aggs.tail: _*)
    }
  }
}
