package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.{Lzf, Szip}
import graft.io.Szip.Params

/** Randomized (deterministic-seed) stress over the hand-built codecs:
  * hundreds of parameter/data-shape combinations, each a full
  * encode->decode equality check. The shapes target the codecs' edge
  * machinery — block boundaries, zero runs, value-range rails, match
  * length/offset limits — where off-by-ones live. */
class CodecStressSpec extends AnyFunSuite {

  private final class Rng(var s: Long) {
    def next(): Long = {
      s = s * 6364136223846793005L + 1442695040888963407L; s >>> 11
    }
    def below(n: Int): Int = math.floorMod(next(), n.toLong).toInt
  }

  test("szip: 300 random parameter/data combinations roundtrip") {
    val r = new Rng(2026)
    (0 until 300).foreach { trial =>
      val bpp = Seq(8, 16, 32)(r.below(3))
      val ppb = 2 + 2 * r.below(16) // even, 2..32
      val n = 1 + r.below(900)
      val pps = 1 + r.below(n + 40)
      val nn = r.below(2) == 0
      val mask = Szip.RawMask | (if (nn) Szip.NnMask else Szip.EcMask)
      val maxV = (1L << bpp) - 1
      val xs = r.below(5) match {
        case 0 => Array.fill(n)(r.next() & maxV) // max entropy
        case 1 => Array.fill(n)(0L) // zero runs
        case 2 => // smooth ramp with small noise
          var v = r.next() & maxV
          Array.fill(n) { v = (v + r.below(7) - 3 + maxV + 1) & maxV; v }
        case 3 => // rails: slam between 0 and max
          Array.tabulate(n)(i => if ((i + r.below(2)) % 2 == 0) 0L else maxV)
        case _ => // mostly-constant with spikes
          val base = r.next() & maxV
          Array.tabulate(n)(i => if (r.below(17) == 0) r.next() & maxV
                                 else base)
      }
      val p = Params(mask, bpp, ppb, pps)
      val dec = Szip.decompress(Szip.compress(xs, p), n, p)
      assert(dec.toSeq === xs.toSeq,
        s"trial $trial: bpp=$bpp ppb=$ppb pps=$pps nn=$nn n=$n shape failed")
    }
  }

  test("lzf: 200 random data shapes roundtrip") {
    val r = new Rng(777)
    (0 until 200).foreach { trial =>
      val n = r.below(20000)
      val data = new Array[Byte](n)
      var i = 0
      while (i < n) {
        r.below(4) match {
          case 0 => // literal noise run
            val run = math.min(n - i, 1 + r.below(50))
            (0 until run).foreach(k => data(i + k) = r.next().toByte)
            i += run
          case 1 => // repeat of a recent window (forces back-references)
            if (i == 0) { data(i) = 7; i += 1 }
            else {
              val dist = 1 + r.below(math.min(i, 9000))
              val run = math.min(n - i, 1 + r.below(400))
              (0 until run).foreach(k => data(i + k) = data(i + k - dist))
              i += run
            }
          case 2 => // constant run
            val run = math.min(n - i, 1 + r.below(700))
            val v = r.next().toByte
            java.util.Arrays.fill(data, i, i + run, v)
            i += run
          case _ => data(i) = (i % 251).toByte; i += 1
        }
      }
      val dec = Lzf.decompress(Lzf.compress(data), n)
      assert(dec.toSeq === data.toSeq, s"trial $trial: n=$n failed")
    }
  }
}
