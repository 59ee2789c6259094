package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.streaming.StreamOps

/** Streaming extension (SURVEY.md §2.11): watermarked resample equals
  * batch; custom per-key state via mapGroupsWithState. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming resample over finite source equals batch aggregation") {
    val agg = StreamOps.resampleCounts(
      StreamOps.eventsStream(spark, sf), "1 hour", "10 minutes")
    val streamed = StreamOps.runToCompletion(spark, agg,
      s"stream_spec_${System.nanoTime}")
    val batch = graft.io.Tables.events(spark, sf)
      .groupBy(date_trunc("HOUR", col("ts")).as("w_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val s = streamed.select("w_start", "event_type", "n").collect().toSet
    val b = batch.collect().toSet
    assert(s === b)
  }

  test("custom state: running per-user count via mapGroupsWithState") {
    val ev = StreamOps.eventsStream(spark, sf)
      .select(col("user_id"), col("event_id"))
      .as[(Long, Long)]
    val counted = ev.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (user, n)
      }
    val name = s"stream_state_${System.nanoTime}"
    val q = counted.toDF("user_id", "n").writeStream
      .outputMode(OutputMode.Update).format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    // latest state per user == batch count
    val fin = spark.table(name).groupBy("user_id").agg(max("n").as("n"))
    val batch = graft.io.Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(fin.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      batch.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}
