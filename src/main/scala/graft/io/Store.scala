package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Chunked-store sink/source (ref `to_zarr` `dataset.py:2204`, store
  * `backends/zarr.py:655`): a zarr chunk grid maps to a parquet layout
  * partitioned by (coarse) dimension keys — each partition directory is a
  * "chunk", readable independently with partition pruning.
  *
  * Region writes (`to_zarr(region=...)`) map to dynamic partition
  * overwrite: only the partitions present in the incoming frame are
  * replaced, the rest of the store is untouched — same contract as zarr
  * region writes.
  */
object Store {

  /** Write a dataset as a partitioned ("chunked") store. */
  def write(df: DataFrame, path: String, chunkCols: Seq[String],
            mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(chunkCols: _*).parquet(path)

  /** Region write: replace only the chunks covered by `df`
    * (dynamic partition overwrite). */
  def writeRegion(df: DataFrame, path: String, chunkCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(chunkCols: _*).parquet(path)

  /** Open the store; chunk-key predicates become partition pruning. */
  def open(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
