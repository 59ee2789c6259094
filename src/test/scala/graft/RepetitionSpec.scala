package graft

import org.apache.spark.sql.functions._
import graft.llm.TextAnalysis

/** Repetition signals + cleaning pinned to hand-computed values. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, s: String): Any =
    Seq(s).toDF("t").select(c.as("r")).head().get(0)

  test("dupNgramRatio counts duplicate word n-grams") {
    // "a b a b a": 2-grams = [a b, b a, a b, b a] -> 2 distinct of 4 -> 0.5
    assert(one(TextAnalysis.dupNgramRatio(col("t"), 2), "a b a b a") === 0.5)
    // all distinct 2-grams -> 0.0
    assert(one(TextAnalysis.dupNgramRatio(col("t"), 2), "x y z") === 0.0)
    // shorter than n -> NULL
    assert(one(TextAnalysis.dupNgramRatio(col("t"), 3), "x y") === null)
  }

  test("cleanText strips html, urls, emails and squeezes whitespace") {
    val dirty = "Hi <b>there</b>  visit https://x.co/a?b=1 or mail me@x.co now"
    assert(one(TextAnalysis.cleanText(col("t")), dirty) ===
      "Hi there visit or mail now")
  }
}
