package graft.util

import org.apache.spark.sql.DataFrame

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
  /** `df`, repartitioned to `spark.sparkContext.defaultParallelism` iff its
    * current partition count is lower. */
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
