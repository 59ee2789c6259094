package graft

import org.apache.spark.sql.functions._
import graft.model.Categorical

/** Dictionary-encoding laws (ref `core/extension_array.py`). */
class CategoricalSpec extends SparkSpec {
  import spark.implicits._

  private def src = Seq(
    (1L, "b"), (2L, "a"), (3L, "b"), (4L, null.asInstanceOf[String]),
    (5L, "c"), (6L, "a")).toDF("id", "cat")

  test("codes are dense label-sorted ordinals; null -> -1") {
    val dict = Categorical.dictionary(src, "cat")
    assert(dict.orderBy("code").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq ===
      Seq((0L, "a"), (1L, "b"), (2L, "c")))
    val enc = Categorical.encode(src, "cat", dict, "code")
    assert(enc.filter(col("id") === 4L).head().getAs[Long]("code") === -1L)
  }

  test("decode(encode(df)) roundtrips the label column") {
    val dict = Categorical.dictionary(src, "cat")
    val rt = Categorical.decode(
      Categorical.encode(src, "cat", dict, "code"), dict, "code", "cat")
    assert(rt.select("id", "cat").orderBy("id").collect().toSeq ===
      src.orderBy("id").collect().toSeq)
  }

  test("groupBy on codes == groupBy on strings") {
    val dict = Categorical.dictionary(src, "cat")
    val enc = Categorical.encode(src, "cat", dict, "code")
    val byCode = Categorical.decode(
      enc.groupBy("code").agg(count(lit(1)).as("n")), dict, "code", "cat")
      .select("cat", "n")
    val byString = src.groupBy("cat").agg(count(lit(1)).as("n"))
    assert(byCode.exceptAll(byString).isEmpty &&
      byString.exceptAll(byCode).isEmpty)
  }
}
