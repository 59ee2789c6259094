package graft

import org.apache.spark.sql.functions._
import graft.model.XDataset
import graft.reshape.Reshape
import scala.util.Random

/** Property-style laws over seeded random fixtures (FIXTURES.md F6 envelope:
  * varied sizes incl. 0/1, NULL fractions, duplicate labels). */
class LawsSpec extends SparkSpec {
  import spark.implicits._

  private def randomDf(seed: Int) = {
    val rng = new Random(seed)
    val n = rng.nextInt(30) + 1
    (0 until n).map { i =>
      (rng.nextInt(4).toLong,                       // dup-heavy group labels
        i.toLong,
        if (rng.nextDouble() < 0.2) null else java.lang.Double.valueOf(rng.nextDouble()))
    }.toDF("g", "pos", "v")
  }

  test("law: groupby-sum partitions the total sum (flox partition law)") {
    (1 to 5).foreach { seed =>
      val df = randomDf(seed)
      val total = df.agg(sum("v")).head
      val byGroup = df.groupBy("g").agg(sum("v").as("s"))
        .agg(sum("s")).head
      assert((total.isNullAt(0) && byGroup.isNullAt(0)) ||
        math.abs(total.getDouble(0) - byGroup.getDouble(0)) < 1e-9,
        s"seed=$seed")
    }
  }

  test("law: stack/unstack roundtrip on random fixtures") {
    (1 to 5).foreach { seed =>
      val df = randomDf(seed)
      val back = Reshape.unstack(Reshape.stack(df, Seq("g", "pos"), "flat"), "flat")
        .select("g", "pos", "v")
      assert(back.collect().toSet === df.collect().toSet, s"seed=$seed")
    }
  }

  test("law: align inner keys = intersection, outer = union") {
    (1 to 5).foreach { seed =>
      val a = XDataset(randomDf(seed).select(col("pos"), col("v").as("va")), Seq("pos"))
      val b = XDataset(randomDf(seed + 100).select(col("pos"), col("v").as("vb")), Seq("pos"))
      val ka = a.df.select("pos").as[Long].collect().toSet
      val kb = b.df.select("pos").as[Long].collect().toSet
      val inner = graft.align.Align.join(a, b, "inner").select("pos").as[Long].collect().toSet
      val outer = graft.align.Align.join(a, b, "outer").select("pos").as[Long].collect().toSet
      assert(inner === ka.intersect(kb), s"seed=$seed")
      assert(outer === ka.union(kb), s"seed=$seed")
    }
  }

  test("law: whereMask then dropna == whereDrop (long-format equivalence)") {
    (1 to 3).foreach { seed =>
      val ds = XDataset(randomDf(seed), Seq("g", "pos"))
      val cond = col("v") > 0.5
      val a = ds.whereMask(cond).dropna(Seq("v")).df.select("g", "pos", "v")
      val b = ds.whereDrop(cond).df.select("g", "pos", "v")
      assert(a.collect().toSet === b.collect().toSet, s"seed=$seed")
    }
  }
}
