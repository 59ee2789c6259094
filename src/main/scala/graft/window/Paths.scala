package graft.window

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-path mining: the top-k length-n event-type sequences users
  * actually follow — the generalization of the Markov transition matrix
  * (n = 2) to longer paths. Per-user lead() windows (partitioned — no
  * global sort), then the wordcount-shaped partial+final hash aggregate
  * over path strings, then a TakeOrdered top-k. */
object Paths {

  def topPaths(events: DataFrame, user: String, ts: String, tieBreak: String,
               typeCol: String, n: Int, k: Int,
               sep: String = ">"): DataFrame = {
    require(n >= 2 && n <= 8, s"path length $n out of range 2..8")
    val w = Window.partitionBy(col(user)).orderBy(col(ts), col(tieBreak))
    val withLeads = (1 until n).foldLeft(events.select(col(user),
      col(ts), col(tieBreak), col(typeCol))) { (d, i) =>
      d.withColumn(s"__l$i", lead(col(typeCol), i).over(w))
    }
    val path = concat_ws(sep,
      (col(typeCol) +: (1 until n).map(i => col(s"__l$i"))): _*)
    withLeads
      .filter(col(s"__l${n - 1}").isNotNull) // complete windows only
      .select(path.as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(k)
  }
}
