package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.Szip
import graft.io.Szip.Params

/** CCSDS 121 adaptive-Rice codec (the szip filter stream): roundtrips
  * across sample widths / block sizes / option modes, the low-entropy
  * paths (zero-block runs, rest-of-segment, second extension), and
  * bit-level pins that freeze the stream format. */
class SzipSpec extends AnyFunSuite {

  // deterministic LCG so failures reproduce
  private def lcg(seed: Long, n: Int, bound: Long): Array[Long] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 16) % bound
    }
  }

  private def roundtrip(xs: Array[Long], p: Params): Unit = {
    val enc = Szip.compress(xs, p)
    val dec = Szip.decompress(enc, xs.length, p)
    assert(dec.toSeq === xs.toSeq,
      s"roundtrip mismatch for bpp=${p.bpp} ppb=${p.ppb} pps=${p.pps} " +
        s"nn=${p.nn} n=${xs.length}")
  }

  test("roundtrip: random samples across widths, block sizes, modes") {
    for {
      bpp <- Seq(8, 16, 32)
      ppb <- Seq(8, 16, 32)
      nn <- Seq(true, false)
    } {
      val mask = Szip.RawMask | (if (nn) Szip.NnMask else Szip.EcMask)
      val p = Params(mask, bpp, ppb, pps = 67) // deliberately % ppb != 0
      roundtrip(lcg(bpp * 131L + ppb, 500, 1L << bpp), p)
    }
  }

  test("roundtrip: smooth data (small deltas exercise low split k)") {
    val xs = Array.tabulate(300)(i => 1000L + i + (i % 3))
    roundtrip(xs, Params(Szip.RawMask | Szip.NnMask, 16, 16, 64))
  }

  test("roundtrip: constant data compresses to near nothing (NN zero-blocks)") {
    val xs = Array.fill(1024)(77L)
    val p = Params(Szip.RawMask | Szip.NnMask, 8, 8, 256)
    val enc = Szip.compress(xs, p)
    // 4 scanlines x (ref byte + a couple of run codewords) — far below raw
    assert(enc.length < 30, s"constant run encoded to ${enc.length} bytes")
    assert(Szip.decompress(enc, xs.length, p).toSeq === xs.toSeq)
  }

  test("roundtrip: all-zero EC data uses zero-block + rest-of-segment") {
    // 128 blocks of 8 => two full 64-block segments per scanline
    val xs = Array.fill(1024)(0L)
    val p = Params(Szip.RawMask | Szip.EcMask, 8, 8, 1024)
    val enc = Szip.compress(xs, p)
    assert(enc.length <= 3, s"zero segment encoded to ${enc.length} bytes")
    assert(Szip.decompress(enc, xs.length, p).toSeq === xs.toSeq)
  }

  test("roundtrip: extremes pin the delta mapper at the value-range edges") {
    for (bpp <- Seq(8, 16, 32)) {
      val maxV = (1L << bpp) - 1
      // slam between the rails: theta saturates on alternating sides
      val xs = Array.tabulate(64)(i => if (i % 2 == 0) 0L else maxV) ++
        Array(maxV, maxV, 0L, 1L, maxV - 1, maxV / 2, maxV / 2 + 1)
      roundtrip(xs, Params(Szip.RawMask | Szip.NnMask, bpp, 8, 32))
    }
  }

  test("roundtrip: shorter than one block, and exactly one sample") {
    val p = Params(Szip.RawMask | Szip.NnMask, 8, 16, 16)
    roundtrip(Array(42L), p)
    roundtrip(Array(5L, 250L, 0L), p)
  }

  test("roundtrip: second extension wins on paired tiny deltas (EC)") {
    // 0,0,0,1 repeating: pairs map to m=0 / m=2, so SE pays 8 FS values
    // (16 bits) + the extra ID bit vs 20 FS+payload bits for the best
    // split — SE is provably chosen for every block
    val xs = Array.tabulate(256)(i => if (i % 4 == 3) 1L else 0L)
    val p = Params(Szip.RawMask | Szip.EcMask, 8, 16, 256)
    val enc = Szip.compress(xs, p)
    // 16 blocks x (3 ID + 1 + 16 FS) = 320 bits = 40 bytes
    assert(enc.length === 40, s"SE path encoded to ${enc.length} bytes")
    assert(Szip.decompress(enc, xs.length, p).toSeq === xs.toSeq)
  }

  test("bitstream pin: incompressible EC block falls back to raw + all-ones ID") {
    // one 8-sample block of max-entropy bytes: ID=0b111 then 8 raw bytes
    val xs = Array(0xF0L, 0x0FL, 0xAAL, 0x55L, 0x00L, 0xFFL, 0x3CL, 0xC3L)
    val p = Params(Szip.RawMask | Szip.EcMask, 8, 8, 8)
    val enc = Szip.compress(xs, p)
    assert(enc.length === 9) // 3 ID bits + 64 raw = 67 bits -> 9 bytes
    assert((enc(0) & 0xE0) === 0xE0, "no-compression ID must be 0b111")
    // payload is the samples shifted left 3 (MSB-first after the ID)
    val bits = BigInt(1, enc) >> (9 * 8 - 67)
    val raw = xs.foldLeft(BigInt(7))((a, v) => (a << 8) | BigInt(v))
    assert(bits === raw)
  }

  test("bitstream pin: EC zero run of three blocks is ID0 + 0 + fs(2)") {
    val xs = Array.fill(24)(0L) // 3 blocks of 8, one scanline
    val p = Params(Szip.RawMask | Szip.EcMask, 8, 8, 24)
    val enc = Szip.compress(xs, p)
    // run reaches scanline end => rest-of-segment: 000 0 00001 -> 9 bits
    assert(enc.length === 2)
    assert(enc(0) === 0x00.toByte && (enc(1) & 0x80) === 0x80)
  }

  test("hdf5 framing: uint32 length header + byte-order marshalling") {
    val raw = Array.tabulate(40)(i => (i * 7 % 256).toByte)
    val cdLe = Seq(Szip.RawMask | Szip.NnMask | Szip.LsbMask, 32, 8, 10)
    val enc = Szip.hdf5Encode(raw, cdLe)
    assert(java.nio.ByteBuffer.wrap(enc, 0, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt === 40)
    assert(Szip.hdf5Decode(enc, cdLe, "t").toSeq === raw.toSeq)
    // MSB (big-endian samples) roundtrips the same bytes
    val cdBe = Seq(Szip.RawMask | Szip.NnMask | Szip.MsbMask, 16, 8, 10)
    assert(Szip.hdf5Decode(Szip.hdf5Encode(raw, cdBe), cdBe, "t").toSeq
      === raw.toSeq)
  }

  test("unsupported parameters fail with actionable errors") {
    val e = intercept[IllegalArgumentException](
      Params(Szip.RawMask, 64, 16, 128))
    assert(e.getMessage.contains("64") && e.getMessage.contains("h5repack"))
    intercept[IllegalArgumentException](Szip.paramsFromCd(Seq(4, 8)))
    // truncated stream surfaces as a clear error, not an array overrun
    val p = Params(Szip.RawMask | Szip.EcMask, 8, 8, 8)
    val enc = Szip.compress(lcg(1L, 64, 256L), p)
    val cut = java.util.Arrays.copyOf(enc, enc.length / 2)
    val t = intercept[IllegalArgumentException](
      Szip.decompress(cut, 64, p))
    assert(t.getMessage.contains("truncated"))
  }
}
