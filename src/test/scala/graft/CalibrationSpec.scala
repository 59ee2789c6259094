package graft

import org.apache.spark.sql.functions._
import graft.llm.Calibration

class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("eceReport: per-bin accuracy vs confidence and the ECE reduction") {
    // bin 2 (probs .20/.30): 2 rows, 1 positive -> acc 500000;
    // conf = (0.20+0.29)/2 = 245000 ppm... use exact values:
    val scored = Seq(
      (0L, 0.200000), (1L, 0.290000), // bucket 2
      (1L, 0.900000), (1L, 0.950000), (0L, 0.910000)) // bucket 9
      .toDF("y", "prob")
    val out = Calibration.eceReport(scored, buckets = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    val (n2, k2, acc2, conf2, sq2, ece) = out(2L)
    assert(n2 == 2L && k2 == 1L && acc2 == 500000L)
    assert(conf2 == 245000L) // (0.20+0.29)*1e6 div 2
    // (0.2-0)^2 + (0.29-1)^2 = 0.04 + 0.5041 = 0.5441
    assert(sq2 == 544100000000L)
    val (n9, k9, acc9, conf9, sq9, ece9) = out(9L)
    assert(n9 == 3L && k9 == 2L && acc9 == 666666L)
    assert(conf9 == 920000L) // (0.90+0.95+0.91)*1e6 div 3
    // (0.9-1)^2 + (0.95-1)^2 + (0.91-0)^2 = 0.01+0.0025+0.8281
    assert(sq9 == 840600000000L)
    // ECE = (2*|500000-245000| + 3*|666666-920000|) div 5 = 253999
    assert(ece == (2 * 255000L + 3 * 253334L) / 5 && ece == ece9)
  }

  test("isotonicFit reproduces PAVA pooling on a violating sequence") {
    // raw rates 0.8, 0.2, 0.4 all pool to 14/30 -> 466666 ppm
    val perB = Seq((1L, 10L, 8L), (2L, 10L, 2L), (3L, 10L, 4L))
      .toDF("bucket", "n", "k")
    val out = Calibration.isotonicFit(perB)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) == ((800000L, 466666L)))
    assert(out(2L) == ((200000L, 466666L)))
    assert(out(3L) == ((400000L, 466666L)))
    // an already-monotone sequence is a fixed point
    val mono = Seq((1L, 10L, 1L), (2L, 10L, 5L), (3L, 10L, 9L))
      .toDF("bucket", "n", "k")
    val out2 = Calibration.isotonicFit(mono)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4)))
      .toMap
    for (b <- Seq(1L, 2L, 3L)) assert(out2(b)._1 == out2(b)._2)
    // partial pooling: 0.1, 0.9, 0.5 -> pool last two to 0.7
    val part = Seq((1L, 10L, 1L), (2L, 10L, 9L), (3L, 10L, 5L))
      .toDF("bucket", "n", "k")
    val out3 = Calibration.isotonicFit(part)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out3 == Map(1L -> 100000L, 2L -> 700000L, 3L -> 700000L))
  }
}
