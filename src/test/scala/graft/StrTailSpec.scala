package graft

import org.apache.spark.sql.functions._
import graft.functions.StrFns

/** Long-tail .str methods pinned to pandas outputs
  * (`pd.Series.str.*` on the same inputs). */
class StrTailSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: String): T =
    Seq(input).toDF("s").select(c.as("r")).head().getAs[T]("r")

  test("get_dummies fixed vocab") {
    val r = Seq("red widget").toDF("s")
      .select(StrFns.getDummies(col("s"), " ", Seq("red", "blue")).as("d"))
      .select("d.red", "d.blue").head()
    assert((r.getInt(0), r.getInt(1)) === ((1, 0)))
  }

  test("wrap breaks at word boundaries like textwrap") {
    // textwrap.wrap('small ring', 8) == ['small', 'ring']
    assert(one[String](StrFns.wrap(col("s"), 8), "small ring") === "small\nring")
    assert(one[String](StrFns.wrap(col("s"), 20), "small ring") === "small ring")
  }

  test("rfind / rpartition from the right") {
    // 'red widget'.rfind('e') == 8
    assert(one[Int](StrFns.rfind(col("s"), "e"), "red widget") === 8)
    assert(one[Int](StrFns.rfind(col("s"), "z"), "red widget") === -1)
    val rp = Seq("a b c").toDF("s")
      .select(StrFns.rpartitionS(col("s"), " ").as("p"))
      .select("p.head", "p.sep", "p.tail").head()
    assert((rp.getString(0), rp.getString(1), rp.getString(2)) === (("a b", " ", "c")))
    val rp2 = Seq("abc").toDF("s")
      .select(StrFns.rpartitionS(col("s"), " ").as("p"))
      .select("p.head", "p.sep", "p.tail").head()
    assert((rp2.getString(0), rp2.getString(1), rp2.getString(2)) === (("", "", "abc")))
  }

  test("removeprefix / removesuffix / slice_replace") {
    assert(one[String](StrFns.removeprefix(col("s"), "un"), "unhappy") === "happy")
    assert(one[String](StrFns.removeprefix(col("s"), "un"), "happy") === "happy")
    assert(one[String](StrFns.removesuffix(col("s"), "ly"), "quickly") === "quick")
    // 'abcdefg'[:2] + 'XX' + 'abcdefg'[5:] == 'abXXfg'
    assert(one[String](StrFns.sliceReplace(col("s"), 2, 5, "XX"), "abcdefg") === "abXXfg")
  }

  test("index/rindex equal find/rfind when present, RAISE when absent") {
    // 'red widget'.index('e') == 1, .rindex('e') == 8
    assert(one[Int](StrFns.index(col("s"), "e"), "red widget") === 1)
    assert(one[Int](StrFns.rindex(col("s"), "e"), "red widget") === 8)
    // python raises ValueError; here the per-row raise_error surfaces as
    // a SparkException wrapping the not-found message
    val ex = intercept[Exception] {
      Seq("red widget").toDF("s")
        .select(StrFns.index(col("s"), "zz").as("r")).collect()
    }
    assert(ex.getMessage.contains("not found") ||
      Option(ex.getCause).exists(_.getMessage.contains("not found")))
  }

  test("isdecimal ⊂ isdigit ⊂ isnumeric distinctions (pandas truth table)") {
    def tbl(s: String): (Boolean, Boolean, Boolean) = (
      one[Boolean](StrFns.isDecimalU(col("s")), s),
      one[Boolean](StrFns.isDigitU(col("s")), s),
      one[Boolean](StrFns.isNumericU(col("s")), s))
    assert(tbl("123") === ((true, true, true)))     // Nd
    assert(tbl("12²") === ((false, true, true)))  // superscript two: No digit
    assert(tbl("½") === ((false, false, true)))   // vulgar half: No numeric
    assert(tbl("Ⅲ") === ((false, false, true)))   // roman III: Nl numeric
    assert(tbl("abc") === ((false, false, false)))
    assert(tbl("12a") === ((false, false, false)))
    assert(tbl("") === ((false, false, false)))     // pandas: empty is False
    assert(tbl("1 2") === ((false, false, false)))  // space breaks the class
  }
}
