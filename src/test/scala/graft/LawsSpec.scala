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

  test("law: roll(n, k) then roll(n, -k) is the identity") {
    (1 to 5).foreach { seed =>
      val rng = new Random(seed)
      val n = rng.nextInt(20) + 1
      val df = (0L until n).map(i => (i, rng.nextDouble())).toDF("pos", "v")
      val rolled = graft.window.Pad.roll(df, "pos", "v", n, seed % 7)
        .select(col("pos"), col("v_rolled").as("v"))
      val back = graft.window.Pad.roll(rolled, "pos", "v", n, -(seed % 7))
        .select(col("pos"), col("v_rolled").as("v"))
      assert(back.collect().toSet === df.collect().toSet, s"seed=$seed n=$n")
    }
  }

  test("law: interpLinear at the knots returns the knot values") {
    (1 to 3).foreach { seed =>
      val rng = new Random(seed)
      val n = rng.nextInt(10) + 2
      // strictly increasing coords (cumulative positive steps)
      val steps = (0 until n).map(_ => 1.0 + rng.nextInt(3))
      val ts = steps.scanLeft(0.0)(_ + _).tail
      val knots = ts.map(t => (1L, t, rng.nextDouble())).toDF("k", "t", "v")
      val probes = knots.select("k", "t")
      val out = graft.numerics.Numerics.interpLinear(knots, probes,
        by = Seq("k"), t = "t", v = "v")
      val mismatch = out.join(knots, Seq("k", "t"))
        .filter(col("v_interp") =!= col("v")).count()
      assert(mismatch === 0L, s"seed=$seed")
    }
  }

  test("law: rank of distinct values equals sort position + 1") {
    (1 to 3).foreach { seed =>
      val rng = new Random(seed + 7)
      val vals = rng.shuffle((1 to 15).map(_.toDouble * 2)).take(10)
      val df = vals.map(v => Tuple1(v)).toDF("v")
      val ranked = graft.agg.Rank.avgRank(df, "v", "r")
        .select("v", "r").collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      val expected = vals.sorted.zipWithIndex.map { case (v, i) => v -> (i + 1.0) }.toMap
      assert(ranked === expected, s"seed=$seed")
    }
  }

  test("law: exact dedup is idempotent (keep set is a fixpoint)") {
    (1 to 3).foreach { seed =>
      val rng = new Random(seed)
      val docs = (0 until 20).map { i =>
        (i.toLong, s"text ${rng.nextInt(5)}") // heavy duplicates
      }.toDF("doc_id", "text")
      val once = graft.llm.Dedup.exact(docs, "doc_id", "text")
      val kept = docs.join(once.select(col("keep_id").as("doc_id")), "doc_id")
      val twice = graft.llm.Dedup.exact(kept, "doc_id", "text")
      assert(twice.filter(col("n_dups") =!= 1).count() === 0L, s"seed=$seed")
      assert(once.select("content_key", "keep_id").collect().toSet ===
        twice.select("content_key", "keep_id").collect().toSet, s"seed=$seed")
    }
  }

  test("law: cumprod with mixed signs/zeros/nulls equals the sequential fold") {
    import org.apache.spark.sql.expressions.Window
    (1 to 5).foreach { seed =>
      val rng = new Random(seed)
      val n = rng.nextInt(30) + 1
      val vals: Seq[java.lang.Double] = (0 until n).map { _ =>
        rng.nextInt(5) match {
          case 0 => null
          case 1 => java.lang.Double.valueOf(0.0)
          case _ => java.lang.Double.valueOf((rng.nextDouble() - 0.5) * 4)
        }
      }
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("pos", "v")
      val w = Window.partitionBy(lit(1)).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val got = df.select(col("pos"), graft.window.Windows.cumprod(col("v"), w).as("cp"))
        .orderBy("pos").collect()
        .map(r => if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1)))
      // sequential fold, skipna: nulls contribute nothing, own row is null
      var acc = 1.0
      val want = vals.map { v =>
        if (v == null) null
        else { acc *= v.doubleValue(); java.lang.Double.valueOf(acc) }
      }
      got.zip(want).zipWithIndex.foreach { case ((g, e), i) =>
        if (e == null) assert(g == null, s"seed=$seed pos=$i")
        else assert(g != null && math.abs(g - e) <= 1e-9 * math.max(1.0, math.abs(e)),
          s"seed=$seed pos=$i got=$g want=$e")
      }
    }
  }

  test("qcut: NULL input yields NULL bin (pd.qcut NaN contract)") {
    val df = Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0, null, 8.0, 9.0, null)
      .toDF("v")
    val b = df.agg(percentile(col("v"),
      array(lit(0.25), lit(0.5), lit(0.75))).as("bs"))
    val out = df.crossJoin(broadcast(b))
      .select(col("v"), graft.agg.Groupers.qcutAssign(col("v"), col("bs"), 4).as("qbin"))
      .collect()
    out.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1), "NULL value must get NULL bin")
      else assert(!r.isNullAt(1) && r.getInt(1) >= 0 && r.getInt(1) <= 3)
    }
    // non-null rows still split evenly across the 4 bins
    val counts = out.filter(!_.isNullAt(1)).groupBy(_.getInt(1)).view.mapValues(_.length)
    assert(counts.values.forall(_ >= 1) && counts.size === 4)
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

  test("law: cumulative_integrate at the last coord equals integrate") {
    import spark.implicits._
    import graft.numerics.Numerics
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    // deterministic irregular series per group
    val rows = for (g <- 1 to 5; i <- 0 to 20) yield
      (g.toLong, i * 1.0 + (i * 7 % 3) * 0.25, ((i * g * 31) % 17) - 8.0)
    val df = rows.toDF("g", "t", "v")
    val w = Window.partitionBy(col("g")).orderBy(col("t"))
    val last = df
      .withColumn("cum", Numerics.cumulativeIntegrate(col("v"), col("t"), w))
      .groupBy("g").agg(max_by(col("cum"), col("t")).as("cum_last"))
    val total = df
      .withColumn("term", Numerics.trapezoid(col("v"), col("t"), w))
      .groupBy("g")
      .agg(sum(col("term").cast(DecimalType(38, 4))).cast("double").as("auc"))
    val joined = last.join(total, "g").collect()
    assert(joined.length == 5)
    joined.foreach { r =>
      assert(math.abs(r.getAs[Double]("cum_last") - r.getAs[Double]("auc")) < 1e-9,
        s"g=${r.getLong(0)}")
    }
  }

  test("law: contamination of a corpus against itself flags every doc with a dup span") {
    import spark.implicits._
    import graft.llm.Dedup
    val span = "0123456789abcdefghij" // 20 chars
    val docs = Seq(
      (1L, span + " tail one long enough to matter"),
      (2L, "head two " + span + " and some trailing text"),
      (3L, "completely unrelated content, nothing shared")
    ).toDF("doc_id", "text")
    // self-decontamination == duplicateSpans membership (hits may differ:
    // contamination counts windows vs a SET, spans need >=2 distinct docs)
    val contaminated = Dedup.contamination(docs, docs, "doc_id", "text",
        gramLen = 20, stride = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(contaminated == Set(1L, 2L, 3L)) // self-match: every doc hits itself
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text",
        gramLen = 20, stride = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(spans == Set(1L, 2L)) // only the true cross-doc duplicate
  }

  test("law: chunks reassemble to the original token stream") {
    import graft.llm.TextAnalysis
    (1 to 5).foreach { seed =>
      val rng = new Random(seed)
      val docs = (0 until 8).map { i =>
        val n = rng.nextInt(120) + 1
        (i.toLong, (0 until n).map(j => s"w${rng.nextInt(50)}_$j")
          .mkString(" "))
      }.toDF("doc_id", "text")
      val (c, o) = (30, 10)
      val chunks = TextAnalysis
        .chunkDocuments(docs, "doc_id", "text", c, o)
        .collect().groupBy(_.getLong(0))
      docs.collect().foreach { r =>
        val id = r.getLong(0)
        val toks = r.getString(1).trim.split("\\s+").toSeq
        val cs = chunks(id).sortBy(_.getInt(1))
        // chunk 0 whole, later chunks minus the overlapping prefix
        val rebuilt = cs.head.getString(4).split(" ").toSeq ++
          cs.tail.flatMap(_.getString(4).split(" ").toSeq.drop(o))
        assert(rebuilt == toks, s"doc $id (seed $seed)")
        // offsets/counts consistent
        cs.foreach { ch =>
          assert(ch.getInt(3) ==
            math.min(c, toks.length - ch.getInt(2)))
        }
      }
    }
  }

  test("law: segment dedup conserves counts — kept == distinct segments") {
    import graft.llm.{Dedup, TextAnalysis}
    (1 to 5).foreach { seed =>
      val rng = new Random(seed * 31)
      val words = Seq("a", "b", "c", "d")
      val docs = (0 until rng.nextInt(12) + 1).map { i =>
        (i.toLong,
          (0 until rng.nextInt(12) + 1)
            .map(_ => words(rng.nextInt(words.length))).mkString(" "))
      }.toDF("doc_id", "text")
      val seg = 2
      val out = Dedup.segmentDedup(docs, "doc_id", "text", seg)
      val chunks = TextAnalysis.chunkDocuments(docs, "doc_id", "text",
        seg, 0)
      // exactly one keeper per distinct segment text survives corpus-wide
      // (fully-duplicated docs vanish and take their n_segments with
      // them, so the occurrence total is conserved only over survivors)
      val totalSegs = chunks.count()
      val distinctSegs = chunks.select("chunk_text").distinct().count()
      val surviving = out.select("doc_id").as[Long].collect().toSet
      val vanishedSegs = chunks
        .filter(!col("doc_id").isInCollection(surviving)).count()
      val sums = out.agg(sum("n_segments"), sum("n_kept")).head()
      assert(sums.getLong(0) == totalSegs - vanishedSegs, s"seed $seed")
      assert(sums.getLong(1) == distinctSegs, s"seed $seed")
    }
  }

  test("law: fusion score bounds — rrf <= 2/(c+1), convex in [0,1]") {
    import graft.llm.Retrieval
    (1 to 3).foreach { seed =>
      val rng = new Random(seed * 17)
      def list(n: Int) = (1 to n).map(i =>
        (rng.nextInt(20).toLong + 1, i)).distinctBy(_._1)
        .zipWithIndex.map { case ((id, _), r) => (id, r + 1) }
        .toDF("id", "rk")
      val a = list(rng.nextInt(8) + 1); val b = list(rng.nextInt(8) + 1)
      Retrieval.rrfFuse(a, b, "id", "rk", k = 50).collect().foreach { r =>
        assert(r.getDouble(2) > 0 && r.getDouble(2) <= 2.0 / 61)
      }
      def scored(n: Int) = (1 to n).map(i =>
        (i.toLong, rng.nextDouble() * 10 - 5)).toDF("id", "score")
      val sa = scored(rng.nextInt(8) + 2); val sb = scored(rng.nextInt(8) + 2)
      Retrieval.convexFuse(sa, sb, "id", "score", alpha = 0.3, k = 50)
        .collect().foreach { r =>
          assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
        }
    }
  }

  test("law: entropy in [0, log2(types)]; diversity and top-gram mass in ppm bounds") {
    import graft.llm.TextAnalysis
    (1 to 3).foreach { seed =>
      val rng = new Random(seed * 31)
      val words = Vector("a", "bb", "ccc", "dd", "e")
      val docs = (1 to 12).map { i =>
        val n = rng.nextInt(10) + 1
        (i.toLong, "s" + rng.nextInt(2),
          Seq.fill(n)(words(rng.nextInt(words.size))).mkString(" "))
      }.toDF("doc_id", "src", "text")
      TextAnalysis.wordEntropy(docs, "doc_id", "text").collect().foreach { r =>
        val (nTok, nTyp, h) = (r.getLong(1), r.getLong(2), r.getDouble(3))
        assert(nTyp <= nTok)
        assert(h >= 0.0 && h <= math.log(nTyp.toDouble) / math.log(2.0) + 1e-6,
          s"H=$h outside [0, log2($nTyp)]")
      }
      TextAnalysis.ngramDiversity(docs, "src", "text", n = 2).collect()
        .foreach { r =>
          assert(r.getLong(3) > 0 && r.getLong(3) <= 1000000L)
          assert(r.getLong(2) <= r.getLong(1))
        }
      TextAnalysis.topNgramMass(docs, "doc_id", "text", n = 2).collect()
        .foreach { r => assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000L) }
    }
  }

  test("law: sessions partition the event log; funnel times are minimal") {
    import graft.window.{Funnel, Sessions}
    (1 to 3).foreach { seed =>
      val rng = new Random(seed * 7)
      val types = Vector("view", "click", "purchase")
      val rows = (1 to 120).map { i =>
        (rng.nextInt(5).toLong, rng.nextInt(5000).toLong,
          types(rng.nextInt(3)))
      }
      val events = rows.toDF("user_id", "t", "event_type")
        .select(col("user_id"), timestamp_seconds(col("t")).as("ts"),
          col("event_type"))
      // conservation: session event counts partition each user's events
      val sess = Sessions.stats(events, "user_id", "ts", gapSec = 300)
        .groupBy("user_id").agg(sum(col("n_events")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val perUser = events.groupBy("user_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sess === perUser)
      // funnel: t_view is each entrant's global minimum view time, and
      // stage times are strictly increasing where present
      val f = Funnel.ordered(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase")).collect()
      val minView = events.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("m"))
        .collect().map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
      f.foreach { r =>
        assert(r.getTimestamp(1) === minView(r.getLong(0)))
        if (!r.isNullAt(2)) assert(r.getTimestamp(2).after(r.getTimestamp(1)))
        if (!r.isNullAt(3)) assert(r.getTimestamp(3).after(r.getTimestamp(2)))
      }
      assert(f.length === minView.size)
    }
  }

  test("law: argsort permutes positions; searchsorted is monotone, side=left") {
    import graft.agg.Rank
    val df = Seq((1L, 0L, 5.0), (1L, 1L, 2.0), (1L, 2L, 5.0), (1L, 3L, 1.0))
      .toDF("g", "pos", "v")
    val a = Rank.argsort(df, Seq("g"), "pos", "v")
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    // sorted order: 1.0(pos 3), 2.0(pos 1), then the 5.0 tie stable 0 < 2
    assert(a === Map(0 -> 3L, 1 -> 1L, 2 -> 0L, 3 -> 2L))
    val s = Rank.searchSorted(df, Seq("g"), "v", Seq(1.0, 2.0, 5.0, 9.0))
      .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    // side="left": equal values are NOT counted
    assert(s === Map(1.0 -> 0L, 2.0 -> 1L, 5.0 -> 2L, 9.0 -> 4L))
    // duplicate probes would double-count into one bucket: rejected
    intercept[IllegalArgumentException] {
      Rank.searchSorted(df, Seq("g"), "v", Seq(1.0, 1.0))
    }
    // NULL values sort LAST (numpy NaN-last; DuckDB ASC default)
    val withNull = Seq((1L, 0L, java.lang.Double.valueOf(5.0)),
      (1L, 1L, null.asInstanceOf[java.lang.Double]),
      (1L, 2L, java.lang.Double.valueOf(1.0)))
      .toDF("g", "pos", "v")
    val an = Rank.argsort(withNull, Seq("g"), "pos", "v")
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(an === Map(0 -> 2L, 1 -> 0L, 2 -> 1L))
  }

  test("law: complex algebra — conj involution, |z|^2 = z*conj(z), div inverts mul") {
    import graft.exprs.ComplexOps._
    val df = Seq((3.0, 4.0, 1.0, -2.0)).toDF("a", "b", "c", "d")
    val z1 = complex(col("a"), col("b")); val z2 = complex(col("c"), col("d"))
    val r = df.select(
      re(conj(conj(z1))).as("cre"), im(conj(conj(z1))).as("cim"),
      re(mul(z1, conj(z1))).as("zz_re"), im(mul(z1, conj(z1))).as("zz_im"),
      abs2(z1).as("a2"),
      re(div(mul(z1, z2), z2)).as("rt_re"),
      im(div(mul(z1, z2), z2)).as("rt_im")).head()
    assert(r.getDouble(0) === 3.0 && r.getDouble(1) === 4.0)
    assert(r.getDouble(2) === 25.0 && r.getDouble(3) === 0.0)
    assert(r.getDouble(4) === 25.0)
    assert(math.abs(r.getDouble(5) - 3.0) < 1e-12 &&
      math.abs(r.getDouble(6) - 4.0) < 1e-12)
  }

  test("law: length buckets conserve docs and tokens; bucket bounds its members") {
    import graft.llm.Packing
    (1 to 3).foreach { seed =>
      val rng = new Random(seed * 13)
      val docs = (1 to 40).map(i => (i.toLong, rng.nextInt(600).toLong))
        .toDF("doc_id", "n")
      val nonzero = docs.filter(col("n") > 0)
      val out = Packing.lengthBuckets(docs, "doc_id", col("n"), batch = 8)
        .collect()
      assert(out.map(_.getLong(1)).sum === nonzero.count())
      assert(out.map(_.getLong(3)).sum ===
        nonzero.agg(sum(col("n"))).head().getLong(0))
      out.foreach { r =>
        val (bucket, nDocs, nBatches, total, slots, waste) =
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getLong(5))
        assert((bucket & (bucket - 1)) === 0L, s"bucket $bucket not a pow2")
        assert(nBatches === (nDocs + 7) / 8)
        assert(slots === nDocs * bucket && waste === slots - total)
        // every member fits: total > n_docs * bucket/2 (else a smaller
        // bucket would hold someone) and total <= slots
        assert(total <= slots)
        if (bucket > 1) assert(total > slots / 2)
      }
    }
  }
}
