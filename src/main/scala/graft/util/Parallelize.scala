package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Adaptive minimum parallelism for compute-heavy scan stages.
  *
  * A parquet scan's partition count follows file/row-group layout
  * (`spark.sql.files.maxPartitionBytes`); a small single-file table scans
  * as ONE partition, which serializes any expensive per-row compute that
  * runs before the first exchange (regex token counts, window-gram
  * hashing, vector normalization). At warehouse scale the scan is already
  * wide and this helper is a no-op branch — it only inserts a round-robin
  * repartition when the input's parallelism is below the cluster's, i.e.
  * exactly the small-input case where the shuffled bytes are trivial.
  */
object Parallelize {

  /** True iff the plan is narrow scan-shaped: no node that introduces an
    * exchange. Only such plans need (or can cheaply measure) a widen —
    * anything with a join/aggregate/window/repartition already runs its
    * downstream stages at `spark.sql.shuffle.partitions`, and calling
    * `.rdd` on it under AQE would eagerly execute its shuffle stages. */
  private def scanShaped(df: DataFrame): Boolean =
    !df.queryExecution.analyzed.exists {
      case _: Join | _: Aggregate | _: Window | _: Sort |
           _: RepartitionOperation | _: Distinct | _: Deduplicate => true
      case _ => false
    }

  /** `df`, repartitioned to `spark.sparkContext.defaultParallelism` iff it
    * is a narrow scan whose partition count is lower. Frames that already
    * contain an exchange are returned untouched. */
  def ensure(df: DataFrame): DataFrame = {
    if (!scanShaped(df)) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
