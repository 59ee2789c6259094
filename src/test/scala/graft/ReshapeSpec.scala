package graft

import org.apache.spark.sql.functions._
import graft.reshape.Reshape

/** Reshape laws (FIXTURES.md F3/F6): stack/unstack and melt/unmelt are
  * inverses; concat preserves multiset of rows. */
class ReshapeSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq((1L, "a", 1.0, 10.0), (2L, "b", 2.0, 20.0))
    .toDF("k1", "k2", "v1", "v2")

  test("stack then unstack is identity (ref dataset.py:5333/5597)") {
    val stacked = Reshape.stack(base, Seq("k1", "k2"), "flat")
    assert(stacked.columns.contains("flat") && !stacked.columns.contains("k1"))
    val back = Reshape.unstack(stacked, "flat")
      .select("k1", "k2", "v1", "v2")
    assert(back.collect().toSet === base.collect().toSet)
  }

  test("melt then unmelt is identity (ref dataset.py:5383)") {
    val melted = Reshape.melt(base, Seq("k1", "k2"), Seq("v1", "v2"))
    assert(melted.count() === 4)
    val back = Reshape.unmelt(melted, Seq("k1", "k2"), "variable", "value",
      Seq("v1", "v2")).select("k1", "k2", "v1", "v2")
    assert(back.collect().toSet === base.collect().toSet)
  }

  test("concat along new dim labels parts (ref concat.py:45)") {
    val out = Reshape.concatNewDim("part",
      Seq(("x", base.filter(col("k1") === 1)), ("y", base.filter(col("k1") === 2))))
    assert(out.count() === 2)
    assert(out.select("part").as[String].collect().toSet === Set("x", "y"))
  }
}
