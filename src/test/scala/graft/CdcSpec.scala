package graft

import org.apache.spark.sql.functions._
import graft.exprs.CdcExprs

/** Content-defined chunking kernel: reassembly, determinism, and the
  * defining CDC property — an edit shifts only the chunks it touches. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(s: String): Seq[(Int, Int)] =
    Seq(s).toDF("t")
      .select(explode(CdcExprs.cdcChunks(col("t"))).as("c"))
      .select("c.start", "c.len").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq

  test("chunks tile the string exactly (no gaps, no overlap, full cover)") {
    val texts = Seq("", "short", "a" * 7,
      "the quick brown fox jumps over the lazy dog " * 20,
      scala.util.Random.alphanumeric.take(5000).mkString)
    texts.foreach { t =>
      val cs = chunksOf(t)
      assert(cs.nonEmpty)
      assert(cs.head._1 === 0)
      cs.sliding(2).foreach {
        case Seq((s1, l1), (s2, _)) => assert(s1 + l1 === s2)
        case _ =>
      }
      assert(cs.last._1 + cs.last._2 === t.length)
      // every chunk except possibly a forced final one is non-empty
      assert(cs.init.forall(_._2 > 0))
    }
  }

  test("an insertion early in the text leaves later chunks' CONTENT intact") {
    val base = ("lorem ipsum dolor sit amet consectetur adipiscing elit " +
      "sed do eiusmod tempor incididunt ut labore et dolore magna ") * 8
    val edited = "INSERTED PREFIX >> " + base
    def contentSet(t: String) =
      chunksOf(t).map { case (s, l) => t.substring(s, s + l) }.toSet
    val a = contentSet(base); val b = contentSet(edited)
    // fixed-size blocks would shift EVERY block; CDC must re-share most
    val shared = a.intersect(b).size
    assert(shared * 10 >= a.size * 8,
      s"only $shared/${a.size} chunks survived an edit — cuts are not content-defined")
  }

  test("interpreted eval and codegen agree (same plan forced both ways)") {
    val t = ("spark native content defined chunking " * 40)
    val viaDf = chunksOf(t) // codegen path
    // interpreted path: direct expression eval
    val expr = graft.exprs.CdcChunks(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(t),
        org.apache.spark.sql.types.StringType), 8, 131L, 64L)
    val arr = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val viaEval = (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2); (r.getInt(0), r.getInt(1))
    }
    assert(viaDf === viaEval)
  }
}
