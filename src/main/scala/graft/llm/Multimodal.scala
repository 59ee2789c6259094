package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches (the Scala analog
  * of `mapInPandas`). The DECODE step is a deterministic STUB — the
  * image/audio codecs aren't in this container — but the Spark-side
  * contract (schema, batching, partitioning) is real and tested:
  * a production decode swaps `fakeDecode` for a JNI/codec call without
  * touching the plan.
  */
object Multimodal {

  /** Output schema of the decode stage. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  /** STUB decode: derives fake dimensions from the byte payload
    * deterministically. Real impl: ??? -> image codec over the bytes. */
  private def fakeDecode(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    (n % 640 + 1, (n * 7) % 480 + 1, 3)
  }

  /** Decode a binary media column per partition (batched, no per-row JVM
    * boundary crossings; the partition is the batch). */
  def decode(df: DataFrame, id: String, media: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(id), col(media)).rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, c) = fakeDecode(bytes)
        Row(r.getLong(0), bytes.length, w, h, c)
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** Frame sampling stub: emit every `stride`-th fixed-size chunk of the
    * payload as a "frame" (schema/partitioning identical to real video
    * frame extraction). */
  def frameSample(df: DataFrame, id: String, media: String,
                  frameBytes: Int, stride: Int): DataFrame =
    df.select(col(id), posexplode(split_binaryChunks(col(media), frameBytes))
      .as(Seq("frame_no", "frame")))
      .filter(col("frame_no") % stride === 0)

  /** Chunk a binary column into fixed-size pieces (expression-only). */
  private def split_binaryChunks(media: org.apache.spark.sql.Column, n: Int) =
    transform(
      sequence(lit(0), greatest(((length(media) - 1) / n).cast("int"), lit(0))),
      i => substring(media, (i * n + 1).cast("int"), lit(n)))
}
