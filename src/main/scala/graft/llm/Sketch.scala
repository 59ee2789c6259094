package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a token stream — the classic fixed-memory
  * heavy-hitter estimator for corpora whose vocabulary does not fit
  * anywhere (Cormode & Muthukrishnan, "An improved data stream summary:
  * the count-min sketch and its applications", J. Algorithms 2005).
  *
  * Scale shape: the sketch build is ONE scan — each token emits its d
  * (row, cell) coordinates into a partial+final hash aggregate whose
  * keyspace is bounded at d*w cells regardless of corpus size; the
  * shuffle carries at most d*w rows per partition. Point estimates join
  * the (tiny) probe set against the d*w-row sketch on (row, cell) —
  * broadcast-sized on both sides.
  *
  * Determinism contract (the repo-wide convention): the hash is the
  * PORTABLE md5-prefix key (28 bits) through fixed Carter-Wegman rows
  * mod p = 2^31-1 — a pure function of the token, so the same corpus
  * sketched on any cluster (or replayed by the DuckDB oracle) produces
  * bit-identical cells. a*h + b stays under 2^60: ANSI-safe.
  */
object Sketch {

  val P = 2147483647L // 2^31 - 1, Mersenne prime

  /** Fixed pairwise-independent row constants (a, b), a odd. */
  val cmRows: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L),
    (1664525L, 1013904223L),
    (22695477L, 1L),
    (69069L, 362437L))

  /** 28-bit integer key of a token: md5 hex prefix (7 nibbles), the
    * portable hash every oracle can replay. */
  def tokenKey(tok: Column): Column =
    conv(substring(md5(tok), 1, 7), 16, 10).cast("long")

  private def cell(h: Column, a: Long, b: Long, w: Int): Column =
    pmod(pmod(lit(a) * h + lit(b), lit(P)), lit(w))

  /** Long-form sketch of `tokCol` in `toks`: (row, cell, cnt) — d*w
    * bounded rows, one scan. */
  def countMin(toks: DataFrame, tokCol: String, w: Int,
               rows: Seq[(Long, Long)] = cmRows): DataFrame = {
    val h = tokenKey(col(tokCol))
    val coords = rows.zipWithIndex.map { case ((a, b), j) =>
      struct(lit(j).as("row"), cell(h, a, b, w).as("cell"))
    }
    toks.select(explode(array(coords: _*)).as("rc"))
      .groupBy(col("rc.row").as("row"), col("rc.cell").as("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for the tokens in `probes(tokCol)`: est = min over
    * the d rows of the probed cell. CMS guarantees est >= true count,
    * with overcount bounded by (e/w)*N w.p. 1-(1/2)^d. `probes` is a
    * small frame (heavy-hitter candidates, an eval set) — the join is
    * (|probes|*d) x (d*w), both broadcast-scale. */
  def estimate(sketch: DataFrame, probes: DataFrame, tokCol: String,
               w: Int, rows: Seq[(Long, Long)] = cmRows): DataFrame = {
    val h = tokenKey(col(tokCol))
    val coords = rows.zipWithIndex.map { case ((a, b), j) =>
      struct(lit(j).as("row"), cell(h, a, b, w).as("cell"))
    }
    probes.select(col(tokCol), explode(array(coords: _*)).as("rc"))
      .select(col(tokCol), col("rc.row").as("row"), col("rc.cell").as("cell"))
      .join(sketch, Seq("row", "cell"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(tokCol)
      .agg(min(col("cnt")).as("est"))
  }
}
