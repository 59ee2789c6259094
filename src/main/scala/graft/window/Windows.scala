package graft.window

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Moving-window vocabulary (ref `xarray/computation/rolling.py`): rolling /
  * cumulative / coarsen / shift / diff / ffill / bfill as Spark window specs.
  *
  * Scale rule: every spec partitions by the non-window dims (`partitionBy`)
  * so the sort stays within bounded groups — an unpartitioned orderBy window
  * is a single-task bottleneck and is deliberately not offered here.
  */
object Windows {

  /** rolling(dim, window) ending at the current row (xarray default,
    * `rolling.py:56`; label = right edge). */
  def rolling(partitionBy: Seq[Column], orderBy: Seq[Column], window: Int): WindowSpec =
    base(partitionBy, orderBy).rowsBetween(-(window - 1), 0)

  /** center=True variant (`rolling.py` center: window centred on label). */
  def rollingCentered(partitionBy: Seq[Column], orderBy: Seq[Column], window: Int): WindowSpec =
    base(partitionBy, orderBy).rowsBetween(-((window - 1) / 2), window / 2)

  /** cumulative / expanding (ref `dataset.py:10452`). */
  def expanding(partitionBy: Seq[Column], orderBy: Seq[Column]): WindowSpec =
    base(partitionBy, orderBy).rowsBetween(Window.unboundedPreceding, 0)

  private def base(partitionBy: Seq[Column], orderBy: Seq[Column]): WindowSpec =
    if (partitionBy.isEmpty) Window.orderBy(orderBy: _*)
    else Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)

  /** min_periods guard (ref `rolling.py` min_periods): NULL until at least
    * `mp` non-null observations are in the window. */
  def withMinPeriods(agg: Column, c: Column, w: WindowSpec, mp: Int): Column =
    when(count(c).over(w) >= mp, agg)

  /** rolling(...).reduce(func) — the reference's arbitrary-function
    * contract (`computation/rolling.py` Rolling.reduce): the window
    * materializes as an array (construct) and a caller-supplied fold
    * reduces it, entirely in Catalyst expressions — no UDF, the lambda
    * compiles into the plan. `finish` sees (accumulator, window array)
    * so normalizations can use the window length. */
  def rollingReduce(value: Column, w: WindowSpec, zero: Column,
                    merge: (Column, Column) => Column,
                    finish: (Column, Column) => Column): Column = {
    val arr = collect_list(value).over(w)
    finish(aggregate(arr, zero, merge), arr)
  }

  /** shift by n along the window order (ref `dataset.py:7967`). */
  def shift(c: Column, n: Int, w: WindowSpec): Column =
    if (n >= 0) lag(c, n).over(w) else lead(c, -n).over(w)

  /** n-th discrete difference, label=upper (ref `dataset.py:7879`). */
  def diff(c: Column, w: WindowSpec): Column = c - lag(c, 1).over(w)

  /** ffill with optional limit (ref `dataset.py:6716`; kernel
    * `duck_array_ops.push` — Spark's sort-based window IS the distributed
    * scan the reference builds by hand with a Blelloch scan). */
  def ffill(c: Column, partitionBy: Seq[Column], orderBy: Seq[Column],
            limit: Option[Int] = None): Column = {
    val w0 = base(partitionBy, orderBy)
    val w = limit.map(l => w0.rowsBetween(-l, 0))
      .getOrElse(w0.rowsBetween(Window.unboundedPreceding, 0))
    last(c, ignoreNulls = true).over(w)
  }

  def bfill(c: Column, partitionBy: Seq[Column], orderBy: Seq[Column],
            limit: Option[Int] = None): Column = {
    val w0 = base(partitionBy, orderBy.map(_.desc))
    val w = limit.map(l => w0.rowsBetween(-l, 0))
      .getOrElse(w0.rowsBetween(Window.unboundedPreceding, 0))
    last(c, ignoreNulls = true).over(w)
  }

  /** N-dimensional rolling window (ref `rolling.py` multi-dim rolling —
    * the genuinely ND-specific case): each cell EXPLODES into one
    * contribution per window cell it belongs to, then one hash aggregation
    * per output cell collects its window. Map-side explode + a single
    * shuffle on the cell key — no nested window functions, scales as
    * |grid| x window-area, and partial aggregation combines map-side.
    * Edge cells see fewer contributors = min_periods=1 semantics; the
    * inner join back to the real cell set drops out-of-grid phantoms. */
  def rolling2dContrib(df: DataFrame, dim1: String, dim2: String,
                       half1: Int, half2: Int): DataFrame = {
    val offsets = for (di <- -half1 to half1; dj <- -half2 to half2)
      yield struct(lit(di).as("di"), lit(dj).as("dj"))
    df.withColumn("__o", explode(array(offsets: _*)))
      .withColumn("__ci", col(dim1) + col("__o.di"))
      .withColumn("__cj", col(dim2) + col("__o.dj"))
      .drop("__o")
  }

  /** coarsen: non-overlapping block aggregation along a position column
    * (ref `computation/rolling.py:1023`); boundary="trim" drops the ragged
    * tail. Block id = floor(pos / k) — a plain groupBy, no window needed,
    * so it scales as ordinary hash aggregation. */
  def coarsenKey(pos: Column, k: Int): Column = floor(pos / k).cast("long")

  /** coarsen(...).construct(dim -> (outer, inner)) (ref
    * `computation/rolling.py:1103` Coarsen.construct): reshape the
    * position axis into (block, offset) WITHOUT reducing — the windowed
    * view whose later reduce equals coarsen's. Pure projection, no
    * shuffle beyond whatever produced `pos`. */
  def coarsenOffset(pos: Column, k: Int): Column = pmod(pos, lit(k)).cast("long")

  /** rolling.construct with stride + fill_value (ref `rolling.py:327`):
    * materialize each right-labeled window as a FIXED-length array column
    * `window_arr`. `stride` keeps every stride-th position per group
    * (xarray's [::stride] subsample); partial leading windows are
    * left-padded with `fillValue` (pass a typed literal matching `v`) so
    * every emitted array has exactly `window` slots. Values ride inside
    * structs through collect_list so NULLs keep their window slot. */
  def rollingConstruct(df: DataFrame, partitionBy: Seq[Column],
                       orderBy: Seq[Column], v: Column, window: Int,
                       stride: Int = 1,
                       fillValue: Column = lit(null)): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    val wSpec = base(partitionBy, orderBy).rowsBetween(-(window - 1), 0)
    val rnSpec = base(partitionBy, orderBy)
    val withArr = df
      .withColumn("__rn", row_number().over(rnSpec))
      .withColumn("__arr",
        transform(collect_list(struct(v.as("v"))).over(wSpec),
          s => s.getField("v")))
    withArr
      .filter(pmod(col("__rn") - 1, lit(stride)) === 0)
      .withColumn("window_arr",
        when(size(col("__arr")) < window,
          concat(array_repeat(fillValue,
            lit(window) - size(col("__arr"))), col("__arr")))
          .otherwise(col("__arr")))
      .drop("__rn", "__arr")
  }

  /** General cumulative product (ref `core/_aggregations.py` cumprod).
    * A windowed product has no distributed partial-agg form, so it runs as
    * three windowed SUMS — each a single scan with map-side partials:
    * zero count (any zero ⇒ 0 from there on), negative count (sign =
    * (-1)^negs), and Σ log|x| in DECIMAL (order-independent, cross-engine
    * exact) exponentiated back. This handles the zero/negative factors the
    * naive exp(Σ log x) trick silently corrupts. NULL factors are skipped
    * (pandas skipna): they contribute nothing and their own row is NULL.
    * Float caveat: magnitude goes through exp∘log, so ~1e-14 relative
    * error vs a sequential multiply — round at the consumer if hashing. */
  def cumprod(c: Column, w: WindowSpec): Column = {
    import org.apache.spark.sql.types.DecimalType
    val zeros  = sum(when(c === 0, 1L).otherwise(0L)).over(w)
    val negs   = sum(when(c < 0, 1L).otherwise(0L)).over(w)
    val logAbs = sum(when(c =!= 0, log(abs(c))).cast(DecimalType(30, 12))).over(w)
    val mag    = exp(logAbs.cast("double"))
    val signed = when(pmod(negs, lit(2L)) === 1L, -mag).otherwise(mag)
    when(c.isNull, lit(null).cast("double"))
      .when(zeros > 0, lit(0.0))
      .otherwise(signed)
  }

  /** rolling var (ref `rolling.py` reduce: var/std; numpy ddof semantics,
    * xarray default ddof=0). Σx and Σx² accumulate in DECIMAL over the
    * window — order-independent and cross-engine exact — then the variance
    * formula runs in identical double arithmetic. NULL until the window is
    * full (min_periods=window), which keeps partial-window float noise out
    * of the contract. std = sqrt(rollingVar) (IEEE sqrt is exact). */
  def rollingVar(c: Column, w: WindowSpec, window: Int, ddof: Int): Column = {
    import org.apache.spark.sql.types.DecimalType
    val s1 = sum(c.cast(DecimalType(30, 8))).over(w).cast("double")
    val s2 = sum((c * c).cast(DecimalType(30, 8))).over(w).cast("double")
    val n = count(c).over(w).cast("double")
    // clamp at 0: a constant window can cancel to a tiny NEGATIVE value in
    // the double formula, and sqrt of that is engine-dependent (NaN vs error)
    when(count(c).over(w) === window,
      greatest((s2 - s1 * s1 / n) / (n - lit(ddof)), lit(0.0)))
  }
}
