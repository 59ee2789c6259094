package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.functions.DtFns

/** dt accessor tail pinned to pandas: isocalendar ISO-8601 edges and
  * freq floor/ceil/round boundaries. */
class DtTailSpec extends SparkSpec {
  import spark.implicits._

  private val us15 = 15L * 60L * 1000000L

  private def iso(tsStr: String): (Int, Int, Int) = {
    val r = Seq(Timestamp.valueOf(tsStr)).toDF("t")
      .select(DtFns.isoYear(col("t")).as("y"), DtFns.isoWeek(col("t")).as("w"),
        DtFns.isoDay(col("t")).as("d")).head()
    (r.getInt(0), r.getInt(1), r.getInt(2))
  }

  test("isocalendar ISO-8601 year boundaries match pandas") {
    // pd.Timestamp('2021-01-01').isocalendar() == (2020, 53, 5)
    assert(iso("2021-01-01 00:00:00") === ((2020, 53, 5)))
    // pd.Timestamp('2019-12-30').isocalendar() == (2020, 1, 1)
    assert(iso("2019-12-30 00:00:00") === ((2020, 1, 1)))
    assert(iso("2024-02-29 12:00:00") === ((2024, 9, 4)))
  }

  test("floor/ceil/round 15min: boundaries and ties") {
    val t = Seq(
      Timestamp.valueOf("2024-03-01 10:07:30"),  // tie: exactly half period
      Timestamp.valueOf("2024-03-01 10:07:29"),
      Timestamp.valueOf("2024-03-01 10:15:00")   // already on boundary
    ).toDF("t")
    val out = t.select(
      DtFns.floorFreq(col("t"), us15).cast("string").as("f"),
      DtFns.ceilFreq(col("t"), us15).cast("string").as("c"),
      DtFns.roundFreq(col("t"), us15).cast("string").as("r")).collect()
    assert(out(0).getString(0) === "2024-03-01 10:00:00")
    assert(out(0).getString(1) === "2024-03-01 10:15:00")
    assert(out(0).getString(2) === "2024-03-01 10:15:00") // half rounds up
    assert(out(1).getString(2) === "2024-03-01 10:00:00")
    assert(out(2).getString(0) === "2024-03-01 10:15:00")
    assert(out(2).getString(1) === "2024-03-01 10:15:00") // ceil is identity on boundary
    assert(out(2).getString(2) === "2024-03-01 10:15:00")
  }
}
