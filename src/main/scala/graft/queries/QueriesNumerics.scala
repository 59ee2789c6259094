package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.io.Tables
import graft.numerics.Numerics

/** Numerics / statistics / interpolation queries (SURVEY.md §2.10). */
object QueriesNumerics {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // cov / corr from exact power sums (ref `computation.py:46/152`)
    "q40_cov_corr" -> ((s, dir) => {
      Tables.lineitem(s, dir).groupBy("l_returnflag").agg(
        round(Numerics.covSamp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qp"),
        round(Numerics.corrP(col("l_quantity"), col("l_extendedprice")), 8).as("corr_qp"))
    }),

    // polyval, Horner association (ref `computation.py:836`)
    "q41_polyval" -> ((s, dir) => {
      Tables.customer(s, dir).select(
        col("c_custkey"),
        Numerics.polyval(col("c_acctbal"), Seq(2.0, -0.5, 0.001)).as("poly"))
    }),

    // polyfit degree-1 per group via normal equations (ref `fit.py:101`)
    "q42_polyfit" -> ((s, dir) => {
      Tables.lineitem(s, dir).groupBy("l_returnflag").agg(
        round(Numerics.fitSlope(col("l_quantity"), col("l_extendedprice")), 6).as("slope"),
        round(Numerics.fitIntercept(col("l_quantity"), col("l_extendedprice")), 4).as("intercept"))
    }),

    // differentiate: central differences w.r.t. the time coord
    // (ref `dataset.py:8475`)
    "q43_differentiate" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("t_us", unix_micros(col("ts")))
        .withColumn("dvdt",
          Numerics.differentiate(col("value"), col("t_us").cast("double") / 1e6, w))
        .select("event_id", "user_id", "dvdt")
    }),

    // trapezoidal integrate along the coord (ref `dataset.py:8545`)
    "q44_integrate" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("t_sec", unix_micros(col("ts")).cast("double") / 1e6)
        .withColumn("term", Numerics.trapezoid(col("value"), col("t_sec"), w))
        .groupBy("user_id")
        .agg(sum(col("term").cast(DecimalType(38, 4))).cast("double").as("auc"))
    }),

    // interp(method="linear") at new coord grid (ref `core/missing.py:616`)
    "q45_interp_linear" -> ((s, dir) => {
      val series = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      val users = series.select("user_id").distinct()
      val grid = s.sql(
        """SELECT explode(sequence(timestamp'2024-01-05 00:00:00',
             timestamp'2024-01-25 00:00:00', interval 1 day)) AS ts""")
      val probes = users.crossJoin(grid)
      Numerics.interpLinear(series, probes, by = Seq("user_id"),
        t = "ts", v = "value")
        .select("user_id", "ts", "v_interp")
    }),

    // interpolate_na: linear fill of interior NULL runs (ref `missing.py:331`)
    "q46_interpolate_na" -> ((s, dir) => {
      val masked = Tables.events(s, dir)
        .withColumn("vm", when(col("event_type") =!= "error", col("value")))
        .withColumn("t_sec", unix_micros(col("ts")).cast("double") / 1e6)
      Numerics.interpolateNa(masked, by = Seq(col("user_id")),
        order = Seq(col("ts"), col("event_id")), t = col("t_sec"), v = "vm")
        .select("event_id", "user_id", "vm_interp")
    }),

    // dot: named-dim einsum contraction over the embedding axis
    // (ref `computation.py:484`)
    "q47_dot" -> ((s, dir) => {
      Tables.embeddings(s, dir).select(
        col("vec_id"),
        Numerics.dotDecimal(col("embedding"), reverse(col("embedding"))).as("dot_rev"),
        round(Numerics.normDecimal(col("embedding")), 9).as("l2"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q40_cov_corr" ->
      """SELECT l_returnflag,
         round((sxy - sx * sy / n) / (n - 1), 4) AS cov_qp,
         round((n * sxy - sx * sy) /
           (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 8) AS corr_qp
         FROM (SELECT l_returnflag,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
           CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
           CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
           CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS syy
           FROM lineitem GROUP BY 1)""",
    "q41_polyval" ->
      """SELECT c_custkey,
         (0.001 * c_acctbal + (-0.5)) * c_acctbal + 2.0 AS poly
         FROM customer""",
    "q42_polyfit" ->
      """SELECT l_returnflag,
         round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
         round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4) AS intercept
         FROM (SELECT l_returnflag,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
           CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
           CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx
           FROM lineitem GROUP BY 1)""",
    "q43_differentiate" ->
      """SELECT event_id, user_id,
         (coalesce(lead(value) OVER w, value) - coalesce(lag(value) OVER w, value)) /
         (coalesce(lead(t) OVER w, t) - coalesce(lag(t) OVER w, t)) AS dvdt
         FROM (SELECT *, CAST(epoch_us(ts) AS DOUBLE) / 1e6 AS t FROM events)
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    "q44_integrate" ->
      """SELECT user_id,
         CAST(sum(CAST(term AS DECIMAL(38,4))) AS DOUBLE) AS auc
         FROM (SELECT user_id,
             (value + lag(value) OVER w) / 2 *
             (t - lag(t) OVER w) AS term
           FROM (SELECT *, CAST(epoch_us(ts) AS DOUBLE) / 1e6 AS t FROM events)
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         GROUP BY 1""",
    "q45_interp_linear" ->
      """WITH series AS (
           SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
         probes AS (
           SELECT u.user_id, g.ts FROM
             (SELECT DISTINCT user_id FROM series) u
           CROSS JOIN (SELECT generate_series AS ts FROM
             generate_series(TIMESTAMP '2024-01-05', TIMESTAMP '2024-01-25',
                             INTERVAL 1 DAY)) g),
         back AS (
           SELECT p.user_id, p.ts, s.value AS y0, s.ts AS t0
           FROM probes p ASOF LEFT JOIN series s
           ON p.user_id = s.user_id AND p.ts >= s.ts),
         fwd AS (
           SELECT p.user_id, p.ts, s.value AS y1, s.ts AS t1
           FROM probes p ASOF LEFT JOIN series s
           ON p.user_id = s.user_id AND p.ts <= s.ts)
         SELECT b.user_id, b.ts,
           CASE WHEN t0 IS NULL OR t1 IS NULL THEN NULL
                WHEN CAST(epoch_us(t1) AS DOUBLE) = CAST(epoch_us(t0) AS DOUBLE) THEN y0
                ELSE y0 + (y1 - y0) *
                  (CAST(epoch_us(b.ts) AS DOUBLE) - CAST(epoch_us(t0) AS DOUBLE)) /
                  (CAST(epoch_us(t1) AS DOUBLE) - CAST(epoch_us(t0) AS DOUBLE)) END
             AS v_interp
         FROM back b JOIN fwd f ON b.user_id = f.user_id AND b.ts = f.ts""",
    "q46_interpolate_na" ->
      """SELECT event_id, user_id,
         CASE WHEN vm IS NOT NULL THEN vm
              WHEN y0 IS NULL OR y1 IS NULL THEN NULL
              WHEN t1 = t0 THEN y0
              ELSE y0 + (y1 - y0) * (t - t0) / (t1 - t0) END AS vm_interp
         FROM (SELECT event_id, user_id, vm, t,
             last_value(vm IGNORE NULLS) OVER wa AS y0,
             last_value(CASE WHEN vm IS NOT NULL THEN t END IGNORE NULLS)
               OVER wa AS t0,
             last_value(vm IGNORE NULLS) OVER wd AS y1,
             last_value(CASE WHEN vm IS NOT NULL THEN t END IGNORE NULLS)
               OVER wd AS t1
           FROM (SELECT event_id, user_id, ts,
               CASE WHEN event_type <> 'error' THEN value END AS vm,
               CAST(epoch_us(ts) AS DOUBLE) / 1e6 AS t FROM events)
           WINDOW
             wa AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wd AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))""",
    "q47_dot" ->
      """SELECT vec_id,
         CAST(sum(CAST(CAST(a AS DOUBLE) * CAST(b AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE)
           AS dot_rev,
         round(sqrt(CAST(sum(CAST(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)
           AS DECIMAL(38,12))) AS DOUBLE)), 9) AS l2
         FROM (SELECT vec_id,
             embedding[i] AS a,
             embedding[len(embedding) - i + 1] AS b
           FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i))
         GROUP BY 1"""
  )
}
