package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** 2-D skyline (Pareto frontier, both dimensions maximized) — "the best
  * revenue at every quantity level nobody beats", the multi-objective
  * dominance verb (Börzsönyi et al. 2001, "The Skyline Operator").
  *
  * Distributed shape for the 2-D case: one hash aggregate collapses the
  * data to (x, max y) — after which dominance is a PREFIX MAX over the
  * x-AGGREGATED frame (bounded by distinct x, never rows): a point
  * survives iff its y strictly exceeds every y at strictly larger x.
  * This is the classic sort-filter skyline, but the sort touches only
  * the aggregate. Counts of rows sitting ON each frontier point come
  * from an equi-join back. */
object Skyline {

  /** @param x integer dimension with bounded cardinality (pre-bucket
    *          continuous dimensions)
    * @param y integer dimension (exact grid)
    * @return (x, y, n) frontier points ascending x, descending y, with
    *         the number of input rows exactly at the point. */
  def frontier2d(df: DataFrame, x: Column, y: Column): DataFrame = {
    val pts = graft.util.QueryCache.persist(
      df.select(x.cast("long").as("x"), y.cast("long").as("y")))
    val agg = pts.groupBy(col("x")).agg(max(col("y")).as("y"))
    // prefix over the distinct-x AGGREGATE: max y at strictly larger x
    val w = Window.orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val sky = agg
      .withColumn("__best_right", max(col("y")).over(w))
      .filter(col("__best_right").isNull ||
        col("y") > col("__best_right"))
      .select(col("x"), col("y"))
    sky.join(pts, Seq("x", "y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("n"))
  }
}
