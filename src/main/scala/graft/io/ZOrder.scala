package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton-curve) clustering for multi-dimensional data layout —
  * the standard warehouse answer (Delta/Iceberg `OPTIMIZE ZORDER BY`) to
  * "range predicates on MORE THAN ONE column must skip files". A sort by
  * (a, b) localizes only `a`; interleaving the bits of both keys gives
  * every output file a tight min/max envelope in EACH dimension, so
  * parquet footer stats prune files/row-groups for predicates on `a`,
  * `b`, or both. This is the xarray chunk-grid idea (a chunk is small in
  * every dim at once) applied to a columnar store — at 100 TB the
  * difference between scanning one file and scanning all of them.
  *
  * The z-value is a PURE COLUMN EXPRESSION (shift/mask/or per bit —
  * whole-stage codegen, no UDF): each key is min-max scaled to
  * `bits`-bit unsigned ints (one small stats aggregate per write), then
  * bit-interleaved. Linear scaling keeps ties cheap; heavily skewed keys
  * would want equi-depth ranks instead — the range partitioner on the
  * z-value absorbs moderate skew (balanced FILES regardless of value
  * distribution).
  */
object ZOrder {

  /** Interleave the low `bits` bits of each (already `bits`-bounded,
    * non-negative long) column: result bit `i*k + j` = bit `i` of col
    * `j`. Total bits `k * bits` must fit a signed long. */
  def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    val k = cols.length
    require(k >= 1 && k * bits <= 63,
      s"$k cols x $bits bits exceed a signed long")
    (0 until bits).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * k + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Z-value of `keys` scaled into `bits` bits each from the given
    * (min, max) stats; nulls sort first (z = -1). */
  def zValue(keys: Seq[Column], stats: Seq[(Double, Double)],
             bits: Int = 21): Column = {
    val scaled = keys.zip(stats).map { case (c, (mn, mx)) =>
      val span = mx - mn
      // constant key (span 0): every row maps to rank 0 — the dimension
      // carries no information, so it must not poison the interleave
      val scale = if (span > 0) ((1L << bits) - 1).toDouble / span else 0.0
      least(greatest(((c.cast("double") - mn) * scale), lit(0.0)),
        lit(((1L << bits) - 1).toDouble)).cast(LongType)
    }
    when(keys.map(_.isNull).reduce(_ || _), lit(-1L))
      .otherwise(interleaveBits(scaled, bits))
  }

  /** Attach a `__z` column: one stats aggregate (min/max per key), then
    * the pure-projection z-value. */
  def withZValue(df0: DataFrame, keyNames: Seq[String],
                 bits: Int = 21): DataFrame = {
    // ensure: a single-file scan runs the stats aggregate, the range
    // sampling AND the write's map side all on 1 task (measured 2×1.6 s
    // serialized jobs at sf0.1); min/max are order-independent
    val df = graft.util.Parallelize.ensure(df0)
    val keys = keyNames.map(col)
    val r = df.agg(
      keys.flatMap(c => Seq(min(c.cast("double")), max(c.cast("double")))).head,
      keys.flatMap(c => Seq(min(c.cast("double")), max(c.cast("double")))).tail: _*
    ).collect()(0)
    val stats = keyNames.indices.map { j =>
      val mn = if (r.isNullAt(2 * j)) 0.0 else r.getDouble(2 * j)
      val mx = if (r.isNullAt(2 * j + 1)) 0.0 else r.getDouble(2 * j + 1)
      (mn, mx)
    }
    df.withColumn("__z", zValue(keys, stats, bits))
  }

  /** Write `df` z-ordered by `keyNames` into `numFiles` files: range-
    * partition on the z-value (balanced files even under key skew), sort
    * within each, drop the helper column. Every parquet file then spans
    * a contiguous z-range — a tight per-file envelope in every key. */
  def write(df: DataFrame, path: String, keyNames: Seq[String],
            numFiles: Int, bits: Int = 21): Unit = {
    withZValue(df, keyNames, bits)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
  }
}
