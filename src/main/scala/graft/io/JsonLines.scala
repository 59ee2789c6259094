package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines corpus interchange — the wire format most text corpora
  * ship in (one JSON object per line; ref: the reference's to_dict /
  * from_dict pair is the same record-oriented contract,
  * `xarray/core/dataset.py` to_dict). Built directly on Spark's native
  * distributed json source/sink: the write is one file per partition
  * (no driver collect at any size), the read is a parallel line-split
  * scan.
  *
  * Reads take an EXPLICIT schema: schema inference is a full extra pass
  * over 100 TB and can silently widen types between drops — a corpus
  * contract should pin its schema the way parquet does.
  */
object JsonLines {

  /** Write `df` as JSONL under `path` (overwrite). Spark's JSON writer
    * escapes control characters and non-BMP text per RFC 8259 — the
    * roundtrip is byte-faithful for string payloads. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read a JSONL directory with a pinned schema; FAILFAST so a corrupt
    * line is a loud error, not a silent null row (the PERMISSIVE
    * default turns data bugs into downstream mysteries). */
  def read(spark: SparkSession, path: String, schema: StructType)
      : DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)
}
