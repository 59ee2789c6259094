package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-version comparison verbs — what a pipeline runs after a
  * backfill or migration to answer "what changed" without trusting the
  * writer: keyed snapshot diff and an order-invariant content
  * fingerprint.
  *
  * Hashes are md5-prefix integers (the portable Splits.scala device) so
  * any engine reproduces them; the fingerprint is a SUM of row hashes —
  * commutative, so it is partition- and order-invariant and two
  * fingerprints computed on different engines/cluster layouts compare
  * byte-for-byte. */
object Snapshot {

  /** 52-bit md5-prefix hash of a canonical row rendering. The caller
    * passes pre-gridded, deterministic string renderings (ints, dates,
    * cents — never raw doubles). */
  def rowHash(cols: Seq[Column]): Column =
    conv(substring(md5(concat_ws("|", cols: _*)), 1, 13), 16, 10)
      .cast("long")

  /** Keyed diff of two table versions: per-status row counts
    * (added / removed / changed / unchanged) in ONE full outer join on
    * the key — the shuffle is keyed, rows compare via their hashes, and
    * only the 4-row summary comes back. */
  def diff(a: DataFrame, b: DataFrame, key: String,
           valueCols: Seq[String]): DataFrame = {
    val ha = a.select(col(key).as("__k"),
      rowHash(valueCols.map(col)).as("__ha"))
    val hb = b.select(col(key).as("__k"),
      rowHash(valueCols.map(col)).as("__hb"))
    ha.join(hb, Seq("__k"), "full_outer")
      .select(when(col("__ha").isNull, "added")
        .when(col("__hb").isNull, "removed")
        .when(col("__ha") === col("__hb"), "unchanged")
        .otherwise("changed").as("status"))
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
  }

  /** Order-invariant table fingerprint: Σ row-hash mod 2⁶² (modular
    * addition is commutative AND associative, so layout/partitioning
    * never matters) + row count. Two engines, or the same table
    * before/after a rewrite, agree iff content agrees (w.h.p. of the
    * 52-bit hash). The sum is widened through DECIMAL(38,0) internally
    * (exact at any row count — 10¹² rows of 52-bit hashes is ~4.5e27,
    * well inside 38 digits) and folded mod 2⁶² so the EMITTED column is
    * a plain BIGINT: the driver-hashable output-type contract. */
  val FingerprintMod = 4611686018427387904L // 2^62

  def fingerprint(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(rowHash(cols.map(col)).as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("__h").cast("decimal(38,0)")) %
          lit(FingerprintMod).cast("decimal(38,0)")).cast("long")
          .as("content_sum"))
}
