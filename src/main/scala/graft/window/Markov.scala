package graft.window

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** First-order Markov transition matrix over per-entity event sequences —
  * the user-journey / clickstream summary next to [[Funnel]] and
  * [[Sessions]]: within each entity's (ts, tiebreak)-ordered stream,
  * count `type -> next type` transitions and report each row's exact-ppm
  * share of its source state's outgoing mass. One per-entity lag window
  * + one hash agg on the (from, to) pair (|types|² groups); probabilities
  * are integer floor division — no float rounding convention anywhere. */
object Markov {

  def transitions(events: DataFrame, entity: String, ts: String,
                  typeCol: String, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(col(ts), tiebreak)
    val pairs = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("__tot"))
    pairs.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 1000000 div __tot").as("p_ppm"))
  }

  /** Markov removal-effect attribution (Anderl et al. 2014) — the
    * data-driven alternative to last-touch/linear (q307/q314): model
    * journeys as a first-order chain START → channels → {CONV, NULL},
    * and credit each channel by how much the conversion probability
    * DROPS when the channel is removed (its inbound mass redirected to
    * NULL, which is exactly "its absorption value forced to 0" — the
    * denominators never change).
    *
    * Journey contract: per entity, events in (ts, tiebreak) order up to
    * and INCLUDING the first `convType` event (mapped to the absorbing
    * CONV state); entities that never convert get a terminal NULL edge
    * after their last event. First edge is START → first state.
    *
    * Exactness: absorption probabilities come from `iters` rounds of
    * p_s ← (Σ_t cnt(s,t)·p_t) div tot(s) on the integer 1e9 grid —
    * BigInteger on the collected COUNT matrix (bounded: (|channels|+1)·
    * (|channels|+2) cells, an aggregate, never data), replayed
    * bit-for-bit by unrolled SQL with HUGEINT `//` (the q273 PageRank
    * fixed-point convention). Monotone from below: every iterate is a
    * lower bound of the true absorption probability, so removal deltas
    * are stable non-negative integers.
    *
    * Scale shape: one ordered per-entity window + one (from,to) hash
    * aggregate scan the data; everything after runs on the collected
    * matrix aggregate. */
  def removalAttribution(events: DataFrame, entity: String, ts: String,
                         typeCol: String, tiebreak: Column,
                         convType: String = "purchase",
                         iters: Int = 12): DataFrame = {
    val spark = events.sparkSession
    val GRID = java.math.BigInteger.valueOf(1000000000L)
    val w = Window.partitionBy(col(entity)).orderBy(col(ts), tiebreak)
    val seq0 = events
      .filter(col(entity).isNotNull && col(typeCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__st", when(col(typeCol) === convType, lit("CONV"))
        .otherwise(col(typeCol)))
    val firstConv = seq0.filter(col("__st") === "CONV")
      .groupBy(col(entity)).agg(min(col("__rn")).as("__fc"))
    val journey = seq0.join(firstConv, Seq(entity), "left")
      .filter(col("__fc").isNull || col("__rn") <= col("__fc"))
    val w2 = Window.partitionBy(col(entity)).orderBy(col("__rn"))
    val edges = journey
      .withColumn("__prev", lag(col("__st"), 1).over(w2))
      .select(coalesce(col("__prev"), lit("START")).as("f"),
        col("__st").as("t"))
    val terminal = journey.filter(col("__fc").isNull)
      .groupBy(col(entity))
      .agg(max_by(col("__st"), col("__rn")).as("f"))
      .select(col("f"), lit("NULL").as("t"))
    val cnt = edges.union(terminal)
      .groupBy(col("f"), col("t")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // bounded: (|channels|+1) x (|channels|+2) aggregate cells
    val tot = cnt.groupBy(_._1).map { case (f, xs) => f -> xs.map(_._3).sum }
    val channels = cnt.flatMap(e => Seq(e._1, e._2)).distinct
      .filterNot(Set("START", "CONV", "NULL")).sorted
    def absorb(removed: Option[String]): java.math.BigInteger = {
      val states = (cnt.flatMap(e => Seq(e._1, e._2)).distinct).sorted
      var p = states.map { s =>
        s -> (if (s == "CONV") GRID else java.math.BigInteger.ZERO)
      }.toMap
      for (_ <- 1 to iters) {
        p = states.map { s =>
          val v =
            if (s == "CONV") GRID
            else if (s == "NULL" || removed.contains(s))
              java.math.BigInteger.ZERO
            else tot.get(s) match {
              case None => java.math.BigInteger.ZERO // absorbing leaf
              case Some(den) =>
                cnt.filter(_._1 == s).foldLeft(java.math.BigInteger.ZERO) {
                  case (acc, (_, t, n)) =>
                    acc.add(java.math.BigInteger.valueOf(n)
                      .multiply(p(t)))
                }.divide(java.math.BigInteger.valueOf(den))
            }
          s -> v
        }.toMap
      }
      p.getOrElse("START", java.math.BigInteger.ZERO)
    }
    val pFull = absorb(None)
    val removals = channels.map(c => c -> pFull.subtract(absorb(Some(c))))
    val sumRem = removals.foldLeft(java.math.BigInteger.ZERO)(_ add _._2)
    val M = java.math.BigInteger.valueOf(1000000L)
    import spark.implicits._
    removals.map { case (c, r) =>
      (c, pFull.longValueExact, pFull.subtract(r).longValueExact,
        r.longValueExact,
        if (sumRem.signum == 0) 0L
        else r.multiply(M).divide(sumRem).longValueExact)
    }.toSeq.toDF("channel", "p_full_e", "p_removed_e", "removal_e",
      "share_ppm")
  }
}
