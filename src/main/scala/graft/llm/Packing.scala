package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing — the "concatenate the corpus and chunk it into
  * fixed-length training sequences" step of an LLM pretraining pipeline
  * (GPT-style packing: documents are laid end-to-end in a canonical order
  * and the token stream is split every `seqLen` tokens, so a document may
  * straddle a sequence boundary).
  *
  * The whole op reduces to one primitive: the GLOBAL token offset of every
  * document, i.e. a prefix sum over a 100 TB table. A
  * `sum() over (order by id)` window would funnel the corpus through ONE
  * window partition; instead [[globalRunningSum]] computes it the
  * distributed way (same scheme as [[graft.model.Positions.zipWithIndex]]):
  * range-partition by the order key, partition-LOCAL running sums (a
  * window partitioned by partition id — bounded), then per-partition
  * totals (O(P) rows) collected, scanned into exclusive offsets on the
  * driver, and broadcast-joined back. Two jobs, no global window, no
  * single-task bottleneck.
  */
object Packing {

  /** Attach `sumCol` = running total of `valCol` in `orderCol` order
    * (INCLUSIVE of the current row), computed via per-partition partial
    * sums + broadcast offsets.
    *
    * Dense-integer fast path (the [[graft.model.Positions.zipWithIndex]]
    * scheme): when `orderCol` is an integral column whose values are
    * exactly {min..max} — generated doc ids, the common packing shape —
    * the row's bucket is a PURE PROJECTION `(id - min) div block`, which
    * replaces the range-partitioner's sampling job and the pinned-
    * partition-id persist outright: one probe aggregate, one per-bucket
    * sums job, and the final plan's own exchange-by-bucket. Buckets are
    * perfectly balanced by density, so no skew risk. Non-dense or
    * non-integral order keys fall back to the sampling-based range
    * partitioning below. */
  def globalRunningSum(df: DataFrame, orderCol: Column, valCol: Column,
                       sumCol: String): DataFrame = {
    val spark = df.sparkSession
    val p = math.max(spark.sparkContext.defaultParallelism, 1)
    // persist: the probe aggregate, the partial-sums job, and the final
    // plan all consume this frame — without materialisation each re-runs
    // the (often expensive) valCol from the source scan. Callers
    // (Bench/Verify) clearCache per query, so the entry is query-scoped.
    // An eager localCheckpoint here cost an extra blocking job and cut
    // the plan off from AQE (measured 2-4× on the packing queries).
    val narrow = graft.util.QueryCache.persist(
      df.withColumn("__v", valCol.cast(LongType)))
    import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}
    val odt = narrow.select(orderCol).schema.head.dataType
    if (odt == LongType || odt == IntegerType || odt == ShortType ||
        odt == ByteType) {
      val r = narrow.agg(min(orderCol).cast(LongType),
        max(orderCol).cast(LongType), count(lit(1)),
        count_distinct(orderCol)).collect()(0)
      if (!r.isNullAt(0) &&
          r.getLong(1) - r.getLong(0) + 1 == r.getLong(2) &&
          r.getLong(2) == r.getLong(3)) {
        val mn = r.getLong(0); val n = r.getLong(2)
        val block = math.max(1L, (n + p - 1) / p)
        // exact integral floor-div: Column./ is DOUBLE division; subtract
        // the remainder first so the quotient is an exact multiple
        val diff = orderCol.cast(LongType) - mn
        val bucketOf = (diff - pmod(diff, lit(block))) / block
        // coalesce: a bucket whose __v are all null must contribute 0,
        // not a null that poisons the running offsets
        // Per-bucket offsets IN-PLAN, not via a driver collect: the
        // exclusive prefix runs as an unpartitioned window over the
        // bucket-sums AGGREGATE (<= p rows by construction — parallelism-
        // bounded, never data), and the broadcast join folds it into the
        // SAME action as the final plan. The previous collect+rebroadcast
        // was a whole extra driver job — at small inputs this verb is
        // per-job fixed overhead, which is what the round-14 q146 flag
        // measured (5000 rows, ~0.2 s/job); at scale both shapes shuffle
        // identical bytes.
        val sums = narrow.groupBy(bucketOf.cast(LongType).as("__b"))
          .agg(coalesce(sum(col("__v")), lit(0L)).as("__tot"))
        val wOff = Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offDf = sums
          .withColumn("__off", coalesce(sum(col("__tot")).over(wOff), lit(0L)))
          .drop("__tot")
        val localW = Window.partitionBy("__b").orderBy(orderCol)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return narrow.withColumn("__b", bucketOf.cast(LongType))
          .join(broadcast(offDf), "__b")
          .withColumn(sumCol, col("__off") + sum(col("__v")).over(localW))
          .drop("__b", "__off", "__v")
      }
    }
    // fallback: sampled range partitioning (pinned partition ids)
    val ranged = graft.util.QueryCache.persist(narrow
      .repartitionByRange(p, orderCol)
      .sortWithinPartitions(orderCol)
      .withColumn("__pid", spark_partition_id()))
    // explicit ROWS frame: the default RANGE frame sums all PEERS of a
    // tied order value into every tied row, breaking the per-row running
    // total (ties then share arithmetic, not just arbitrary order)
    val localW = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = ranged.groupBy("__pid")
      .agg(coalesce(sum(col("__v")), lit(0L)).as("__tot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) =>
      (pid, acc + t)
    }.init.zip(totals).map { case ((_, off), (pid, _)) => (pid, off) }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    ranged.join(broadcast(offDf), "__pid")
      .withColumn(sumCol, col("__off") + sum(col("__v")).over(localW))
      .drop("__pid", "__off", "__v")
  }

  /** Padded (document-boundary-preserving) packing — the OTHER standard
    * packing mode: a document never straddles a sequence; when it doesn't
    * fit the remainder, the sequence is padded out and the doc starts the
    * next one (greedy in-order fill; wastes pad tokens but keeps attention
    * within documents). Docs longer than `seqLen` are capped at `seqLen`
    * (the consumer truncates).
    *
    * Greedy fill is a sequential recurrence (each placement depends on the
    * previous end position), so it cannot be a prefix sum. It runs as a
    * per-shard sorted scan (repartition by shard + sortWithinPartitions +
    * mapPartitions — the [[graft.exprs.Ewm]] contract): shards pack
    * independently, exactly as sharded corpus files do in production, and
    * the shard key bounds both the scan state (3 longs) and the skew.
    * Returns (id, shard, eff, seq, pos): sequence ordinal WITHIN the shard
    * and the doc's start offset inside it. */
  def packSequencesPadded(docs: DataFrame, id: String, tokenCount: Column,
                          seqLen: Int, shardCol: Column): DataFrame = {
    val spark = docs.sparkSession
    val sorted = docs
      .select(col(id), shardCol.cast(LongType).as("shard"),
        least(tokenCount.cast(LongType), lit(seqLen.toLong)).as("eff"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(id))
    val outSchema = StructType(Seq(
      StructField(id, sorted.schema(id).dataType, nullable = false),
      StructField("shard", LongType, nullable = false),
      StructField("eff", LongType, nullable = false),
      StructField("seq", LongType, nullable = false),
      StructField("pos", LongType, nullable = false)))
    val rdd = sorted.rdd.mapPartitions { it =>
      var curShard = Long.MinValue
      var haveShard = false
      var seq = 0L
      var end = 0L
      it.map { r =>
        val shard = r.getLong(1); val eff = r.getLong(2)
        if (!haveShard || shard != curShard) {
          curShard = shard; haveShard = true; seq = 0L; end = 0L
        }
        // eff <= seqLen, so a fresh sequence (end == 0) always fits
        if (end + eff > seqLen) { seq += 1L; end = 0L }
        val pos = end
        end += eff
        Row(r.get(0), shard, eff, seq, pos)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Pack documents into `seqLen`-token sequences in `id` order. Returns
    * one row per doc: its global token span [start_off, end_off), the
    * first/last sequence it lands in, and its offset inside the first
    * sequence. Zero-token docs sit at their boundary (`seq_last` =
    * `seq_first`, an empty span). */
  def packSequences(docs: DataFrame, id: String, tokenCount: Column,
                    seqLen: Int): DataFrame = {
    // Parallelize.ensure BEFORE the projection: globalRunningSum caches
    // its input, and the cache fill evaluates tokenCount (a regex pass
    // over every doc) map-side — on a narrow single-file scan that would
    // serialize; repartitioning the raw docs moves the text once and the
    // regex then runs wide. (globalRunningSum persists the projection
    // itself, so the regex runs exactly once either way.)
    val base = graft.util.Parallelize.ensure(docs)
    val withEnd = globalRunningSum(
      base.select(col(id), tokenCount.cast(LongType).as("n_tokens")),
      col(id), col("n_tokens"), "end_off")
    withEnd
      .withColumn("start_off", col("end_off") - col("n_tokens"))
      .withColumn("seq_first", expr(s"start_off div $seqLen"))
      .withColumn("seq_last",
        when(col("n_tokens") > 0, expr(s"(end_off - 1) div $seqLen"))
          .otherwise(expr(s"start_off div $seqLen")))
      .withColumn("pos_in_seq", pmod(col("start_off"), lit(seqLen.toLong)))
      .select(col(id), col("n_tokens"), col("start_off"), col("end_off"),
        col("seq_first"), col("seq_last"), col("pos_in_seq"))
  }

  /** Length-bucketed batching accounting — the inference/eval-serving
    * counterpart of packing: each doc pads to the next power-of-two
    * bucket ≥ its token count, batches of `batch` docs form within a
    * bucket, and the report shows where padding waste concentrates.
    * Pure scan-stage bucket assignment + one hash agg on the bucket key
    * (a handful of groups) — the same plan at any corpus size.
    *
    * The `n_tokens > 0` guard applies to the COUNT the caller supplies:
    * note that a whitespace-tokenized empty string still counts 1 (the
    * split yields [""]), so blank docs land in bucket 1 unless the
    * caller pre-filters them.
    *
    * ceil(log2(n)) is safe in IEEE double for the n here: log2 of a
    * power of two is exact, and elsewhere log2(n) is irrational with the
    * nearest integer more than an ulp away, so ceil never mis-rounds. */
  def lengthBuckets(docs: DataFrame, id: String, tokenCount: Column,
                    batch: Int): DataFrame = {
    require(batch > 0, s"batch must be positive, got $batch")
    val bucketed = docs
      .select(col(id), tokenCount.cast(LongType).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("bucket",
        pow(lit(2.0), ceil(log2(col("n_tokens")))).cast(LongType))
    bucketed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
      .select(col("bucket"), col("n_docs"),
        // full batches of `batch` docs, last one partial (exact int div)
        expr(s"(n_docs + ${batch - 1}) div $batch").as("n_batches"),
        col("total_tokens"),
        (col("n_docs") * col("bucket")).as("padded_slots"),
        // exact integers, not a ratio: power-of-two slot denominators
        // make any fixed-dp rounding of waste/slots land on half-way
        // ties where engines disagree (HALF_UP vs half-even)
        (col("n_docs") * col("bucket") - col("total_tokens"))
          .as("waste_tokens"))
  }
}
