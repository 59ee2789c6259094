package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry: each entry exercises one operator family from SURVEY.md §2
  * through the graft library; [[oracleSql]] holds the DuckDB-equivalent SQL
  * the driver hash-compares against at sf0.01.
  *
  * Float policy (cross-engine exactness): double sums accumulate in decimal
  * ([[graft.model.XDataset.exactSum]]) so Spark and DuckDB agree bit-for-bit;
  * numerically stable statistics (stddev/corr/percentile) are rounded to 4-6
  * dp on BOTH sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_agg_partial")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesCore.queries ++ QueriesAlign.queries ++ QueriesGroupBy.queries ++
      QueriesWindow.queries ++ QueriesReshape.queries ++
      QueriesFunctions.queries ++ QueriesNumerics.queries ++
      QueriesLLM.queries ++ QueriesUdf.queries ++ QueriesStreaming.queries ++
      QueriesMore.queries ++ QueriesCalendar.queries ++
      QueriesCoverage.queries

  /** DuckDB-runnable oracle for each query (same column names/aliases).
    * Queries absent here get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] =
    QueriesCore.oracles ++ QueriesAlign.oracles ++ QueriesGroupBy.oracles ++
      QueriesWindow.oracles ++ QueriesReshape.oracles ++
      QueriesFunctions.oracles ++ QueriesNumerics.oracles ++
      QueriesLLM.oracles ++ QueriesUdf.oracles ++ QueriesStreaming.oracles ++
      QueriesMore.oracles ++ QueriesCalendar.oracles ++
      QueriesCoverage.oracles
}
