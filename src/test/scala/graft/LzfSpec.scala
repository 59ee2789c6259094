package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.Lzf

/** libLZF block format (h5py's lzf HDF5 filter): decoder pins against
  * hand-built streams and compressor roundtrips. */
class LzfSpec extends AnyFunSuite {

  test("decoder pin: hand-built literal + back-reference stream") {
    // "abcabcabcabX": literal "abc" (ctrl 0x02), then a 9-byte match at
    // distance 3 (len field 9-2=7 => ctrl 0xE0 + ext 0, offset byte 2),
    // then literal "X"
    val stream = Array[Byte](
      0x02, 'a', 'b', 'c',
      0xE0.toByte, 0x00, 0x02,
      0x00, 'X')
    assert(new String(Lzf.decompress(stream, 13)) === "abcabcabcabcX")
  }

  test("decoder pin: short match without the extension byte") {
    // literal "ab", match len 3 (field 1 => ctrl 0x20|..), dist 2
    val stream = Array[Byte](0x01, 'a', 'b', 0x20, 0x01)
    assert(new String(Lzf.decompress(stream, 5)) === "ababa")
  }

  test("roundtrip: repetitive, random, and empty inputs") {
    val rep = ("the quick brown fox " * 50).getBytes
    assert(Lzf.decompress(Lzf.compress(rep), rep.length).toSeq === rep.toSeq)
    assert(Lzf.compress(rep).length < rep.length / 2, "repetitive text must shrink")
    var s = 12345L
    val rnd = Array.fill(4096) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 40).toByte
    }
    assert(Lzf.decompress(Lzf.compress(rnd), rnd.length).toSeq === rnd.toSeq)
    assert(Lzf.decompress(Lzf.compress(Array.empty[Byte]), 0).isEmpty)
    val tiny = Array[Byte](1, 2)
    assert(Lzf.decompress(Lzf.compress(tiny), 2).toSeq === tiny.toSeq)
  }

  test("roundtrip: long matches and far offsets cross the encoding limits") {
    // > 264-byte run forces match splitting; > 8k span exercises the
    // 13-bit offset bound
    val data = (Array.fill(600)('z'.toByte) ++
      Array.tabulate(9000)(i => (i % 251).toByte) ++
      Array.fill(600)('z'.toByte))
    assert(Lzf.decompress(Lzf.compress(data), data.length).toSeq === data.toSeq)
  }

  test("corrupt streams fail with clear errors, not overruns") {
    intercept[IllegalArgumentException](
      Lzf.decompress(Array[Byte](0x05, 'a'), 6)) // literal overrun
    intercept[IllegalArgumentException](
      Lzf.decompress(Array[Byte](0x20, 0x10), 5)) // ref before start
    intercept[IllegalArgumentException](
      Lzf.decompress(Array[Byte](0x00, 'a'), 9)) // too little output
  }
}
