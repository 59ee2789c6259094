package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.reshape.Reshape

/** Scalacheck-driven laws over RANDOM dim sets / sizes — the
  * generator-based analogue of the reference's hypothesis suites
  * (`properties/test_index_manipulation.py` drives stack/unstack/
  * rename over random 1-D index variables; `properties/
  * test_properties.py:30`). LawsSpec pins fixed shapes; here the dim
  * COUNT (1-3), per-dim SIZES (0..5, empty and singleton included),
  * stacked SUBSET, labels and NULL placement are all generated, with a
  * fixed initial seed so failures replay. */
class PropertyLawsSpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(12)
    .withInitialSeed(0xCAFEBABEL)

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, s"$name: ${r.status}")
  }

  /** A dense grid dataset over `dims` (cartesian product of coordinate
    * ranges) with a value column carrying generated doubles/NULLs. */
  private def gridDf(dims: Seq[(String, Int)],
                     nullEvery: Int): DataFrame = {
    val names = dims.map(_._1)
    val rowsN = dims.map(_._2).product
    val rows = (0 until rowsN).map { i =>
      val coords = dims.scanRight(1) { case ((_, s), acc) => s * acc }
        .tail.zip(dims).map { case (stride, (_, s)) =>
          ((i / stride) % s).toLong }
      Row.fromSeq(coords :+
        (if (nullEvery > 0 && i % nullEvery == 0) null
         else java.lang.Double.valueOf(i * 1.5 - 7)))
    }
    val schema = StructType(
      names.map(StructField(_, LongType, nullable = false)) :+
        StructField("v", DoubleType, nullable = true))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  private val dimsGen: Gen[Seq[(String, Int)]] = for {
    k <- Gen.choose(1, 3)
    names <- Gen.pick(k, Seq("a", "b", "c", "d"))
    sizes <- Gen.listOfN(k, Gen.choose(0, 5))
  } yield names.toSeq.zip(sizes)

  private val fixtureGen: Gen[(Seq[(String, Int)], Int)] = for {
    dims <- dimsGen
    ne <- Gen.oneOf(0, 2, 3, 7)
  } yield (dims, ne)

  test("law: stack/unstack of a RANDOM dim subset is the identity") {
    check("stack-unstack", Prop.forAll(
      for {
        (dims, ne) <- fixtureGen
        nStack <- Gen.choose(1, dims.length)
        sub <- Gen.pick(nStack, dims.map(_._1))
      } yield (dims, ne, sub.toSeq)) { case (dims, ne, sub) =>
      val df = gridDf(dims, ne)
      val back = Reshape.unstack(Reshape.stack(df, sub, "z"), "z")
        .select(df.columns.map(col).toSeq: _*)
      back.collect().toSet == df.collect().toSet
    })
  }

  test("law: stack preserves the row count exactly") {
    check("stack-count", Prop.forAll(fixtureGen) { case (dims, ne) =>
      val df = gridDf(dims, ne)
      Reshape.stack(df, dims.map(_._1), "z").count() == df.count()
    })
  }

  test("law: selLevel on a stacked level = filter on the original dim") {
    check("sel-level", Prop.forAll(
      for { (dims, ne) <- fixtureGen; v <- Gen.choose(0, 5) }
        yield (dims, ne, v)) { case (dims, ne, v) =>
      val df = gridDf(dims, ne)
      val level = dims.head._1
      val viaStack = Reshape.selLevel(
        Reshape.stack(df, dims.map(_._1), "z"), "z", level, v.toLong)
      val direct = df.filter(col(level) === v.toLong)
      viaStack.count() == direct.count() &&
        Reshape.unstack(viaStack, "z")
          .select(df.columns.map(col).toSeq: _*)
          .collect().toSet == direct.collect().toSet
    })
  }

  test("law: reorderLevels there-and-back is the identity") {
    check("reorder-levels", Prop.forAll(fixtureGen.suchThat(_._1.length >= 2)) {
      case (dims, ne) =>
        val names = dims.map(_._1)
        val df = Reshape.stack(gridDf(dims, ne), names, "z")
        val back = Reshape.reorderLevels(
          Reshape.reorderLevels(df, "z", names.reverse), "z", names)
        back.collect().toSet == df.collect().toSet
    })
  }

  test("law: concat along a NEW dim recovers each part by label") {
    check("concat-new-dim", Prop.forAll(
      for { (dims, ne) <- fixtureGen; parts <- Gen.choose(1, 4) }
        yield (dims, ne, parts)) { case (dims, ne, parts) =>
      val dfs = (0 until parts).map(p =>
        p -> gridDf(dims, if (ne == 0) 0 else ne + p))
      val cat = Reshape.concatNewDim("part", dfs)
      (0 until parts).forall { p =>
        cat.filter(col("part") === p).drop("part").collect().toSet ==
          dfs(p)._2.collect().toSet
      } && cat.count() == dfs.map(_._2.count()).sum
    })
  }

  test("law: concat along an EXISTING dim sums the row counts") {
    check("concat-existing", Prop.forAll(
      for { (dims, ne) <- fixtureGen; parts <- Gen.choose(1, 4) }
        yield (dims, ne, parts)) { case (dims, ne, parts) =>
      val dfs = (0 until parts).map(p => gridDf(dims, ne))
      Reshape.concatExisting(dfs).count() == dfs.map(_.count()).sum
    })
  }

  test("law: align inner = key intersection, outer = key union, over " +
    "random (possibly empty) key sets") {
    check("align-keys", Prop.forAll(
      for {
        na <- Gen.choose(0, 12)
        nb <- Gen.choose(0, 12)
        ka <- Gen.listOfN(na, Gen.choose(0L, 9L))
        kb <- Gen.listOfN(nb, Gen.choose(0L, 9L))
      } yield (ka.distinct, kb.distinct)) { case (ka, kb) =>
      val a = graft.model.XDataset(
        ka.map(k => (k, k * 2.0)).toDF("pos", "va"), Seq("pos"))
      val b = graft.model.XDataset(
        kb.map(k => (k, k * 3.0)).toDF("pos", "vb"), Seq("pos"))
      val inner = graft.align.Align.join(a, b, "inner")
        .select("pos").as[Long].collect().toSet
      val outer = graft.align.Align.join(a, b, "outer")
        .select("pos").as[Long].collect().toSet
      inner == ka.toSet.intersect(kb.toSet) &&
        outer == ka.toSet.union(kb.toSet)
    })
  }

  test("law: every cftime calendar decode∘encode is the identity over " +
    "random day offsets (the reference's test_encode_decode analogue)") {
    import graft.io.CFDecode
    val calendars: Seq[(String, Int, (Column, Int) => Column,
        (Column, Column, Column, Int) => Column)] = Seq(
      ("noleap", 2001, CFDecode.noleapDecode, CFDecode.noleapEncode),
      ("360_day", 2001, CFDecode.cal360Decode, CFDecode.cal360Encode),
      ("all_leap", 2001, CFDecode.allLeapDecode, CFDecode.allLeapEncode),
      ("julian", 2000, CFDecode.julianDecode, CFDecode.julianEncode),
      ("proleptic", 1970, CFDecode.prolepticDecode,
        CFDecode.prolepticEncode))
    check("calendar-roundtrip", Prop.forAll(
      for {
        days <- Gen.listOfN(60, Gen.choose(-200000L, 200000L))
        cal <- Gen.choose(0, calendars.length - 1)
      } yield (days, cal)) { case (days, cal) =>
      val (_, epoch, dec, enc) = calendars(cal)
      val df = days.toDF("d")
        .withColumn("parts", dec(col("d"), epoch))
        .withColumn("back", enc(col("parts.year"), col("parts.month"),
          col("parts.day"), epoch))
      df.filter(col("back") =!= col("d")).count() == 0L &&
        df.filter(col("parts.month") < 1 || col("parts.month") > 12 ||
          col("parts.day") < 1 || col("parts.day") > 31).count() == 0L
    })
  }

  test("law: column calendar decode agrees with the scalar ymdOfDay " +
    "mirror on random days (pins the foldable lookup-array decoders " +
    "against an independent search-based implementation)") {
    import graft.io.CFDecode
    val calendars: Seq[(String, Int, (Column, Int) => Column)] = Seq(
      ("noleap", 2001, CFDecode.noleapDecode),
      ("360_day", 2001, CFDecode.cal360Decode),
      ("all_leap", 2001, CFDecode.allLeapDecode),
      ("julian", 2000, CFDecode.julianDecode))
    check("calendar-lookup-vs-scalar", Prop.forAll(
      for {
        days <- Gen.listOfN(50, Gen.choose(-150000L, 150000L))
        cal <- Gen.choose(0, calendars.length - 1)
      } yield (days, cal)) { case (days, cal) =>
      val (name, epoch, dec) = calendars(cal)
      val got = days.toDF("d")
        .withColumn("p", dec(col("d"), epoch))
        .select(col("d"), col("p.year"), col("p.month"), col("p.day"))
        .as[(Long, Int, Int, Int)].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
      days.forall { d =>
        val (y, m, dd) = CFDecode.ymdOfDay(name match {
          case "proleptic" => "proleptic_gregorian"; case n => n
        }, epoch, d)
        got(d) == ((y, m, dd))
      }
    })
  }

  test("law: CF scale/offset encode∘decode is exact on binary grids; " +
    "mask decode NULLs exactly the fill sentinel") {
    import graft.io.CFDecode
    check("cf-scale-offset", Prop.forAll(
      for {
        raw <- Gen.listOfN(40, Gen.choose(-100000L, 100000L))
        scalePow <- Gen.choose(-6, 3)
        offset <- Gen.choose(-1000, 1000)
      } yield (raw, math.pow(2.0, scalePow), offset.toDouble)) {
      case (raw, scale, offset) =>
        val df = raw.toDF("r")
          .withColumn("v",
            CFDecode.scaleOffsetDecode(col("r").cast("double"), scale, offset))
          .withColumn("back", CFDecode.scaleOffsetEncode(col("v"), scale, offset))
        df.filter(col("back") =!= col("r").cast("double")).count() == 0L
    })
    check("cf-mask", Prop.forAll(
      for {
        vals <- Gen.listOfN(40, Gen.choose(-999L, 999L))
        fill <- Gen.choose(-999L, 999L)
      } yield (vals, fill)) { case (vals, fill) =>
      val df = vals.toDF("v")
        .withColumn("m", CFDecode.maskDecode(col("v"), fill))
      df.filter(col("m").isNull && col("v") =!= fill).count() == 0L &&
        df.filter(col("m").isNotNull && col("v") === fill).count() == 0L
    })
  }

  test("law: all 9 H&F quantile methods are monotone in p and bounded " +
    "by min/max on random data") {
    import graft.exprs.HFQuantile
    check("hf-quantile-monotone", Prop.forAll(
      for {
        n <- Gen.choose(1, 40)
        vals <- Gen.listOfN(n, Gen.choose(-10000, 10000).map(_ / 8.0))
        method <- Gen.choose(1, 9)
      } yield (vals, method)) { case (vals, method) =>
      val qv = HFQuantile.multi(col("v"),
        Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0), method)
      val r = vals.toDF("v")
        .agg(qv.as("qs"), min(col("v")).as("lo"), max(col("v")).as("hi"))
        .head
      val qs = r.getSeq[Double](0)
      val (lo, hi) = (r.getDouble(1), r.getDouble(2))
      qs.zip(qs.tail).forall { case (a, b) => a <= b } &&
        qs.forall(q => q >= lo && q <= hi) &&
        qs.head == lo && qs.last == hi // p=0 -> min, p=1 -> max (all H&F)
    })
  }

  test("law: rename there-and-back is the identity (random dim pick)") {
    check("rename", Prop.forAll(fixtureGen) { case (dims, ne) =>
      val df = gridDf(dims, ne)
      val ds = graft.model.XDataset(df, dims.map(_._1))
      val d0 = dims.head._1
      val back = ds.rename(Map(d0 -> "zz")).rename(Map("zz" -> d0))
      back.df.columns.toSeq == df.columns.toSeq &&
        back.meta.dims == ds.meta.dims &&
        back.df.collect().toSet == df.collect().toSet
    })
  }
}
