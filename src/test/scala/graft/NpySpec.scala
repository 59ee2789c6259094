package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.Npy

/** NumPy .npy/.npz codec: pinned header bytes (so a self-consistent-
  * but-wrong layout cannot pass), Fortran-order transposition, the
  * narrow dtypes, and loud rejects. */
class NpySpec extends AnyFunSuite {

  test("writes the format-1.0 header byte-exactly (pinned)") {
    val b = Npy.write(Seq(3), Array(1.0, 2.0, 3.0))
    assert(b.take(6).toSeq === Seq(0x93.toByte, 'N'.toByte, 'U'.toByte,
      'M'.toByte, 'P'.toByte, 'Y'.toByte))
    assert(b(6) === 1.toByte && b(7) === 0.toByte)
    val hlen = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
    assert((10 + hlen) % 64 === 0) // data starts 64-aligned
    val header = new String(b, 10, hlen, "US-ASCII")
    assert(header.startsWith(
      "{'descr': '<f8', 'fortran_order': False, 'shape': (3,), }"))
    assert(header.endsWith("\n"))
    assert(b.length === 10 + hlen + 24)
  }

  test("f8/i8 round-trips preserve shape and values") {
    val data = Array.tabulate(12)(i => i * 1.5 - 4)
    val (s1, d1) = Npy.read(Npy.write(Seq(3, 4), data))
    assert(s1 === Seq(3, 4) && d1.toSeq === data.toSeq)
    val ints = Array.tabulate(6)(i => (i * 7 - 3).toDouble)
    val (s2, d2) = Npy.read(Npy.write(Seq(6), ints, integral = true))
    assert(s2 === Seq(6) && d2.toSeq === ints.toSeq)
  }

  test("zero-element shapes read as empty arrays") {
    // a valid numpy file with shape (0,) or (3, 0) carries 0 data
    // bytes — legal, must not trip the truncation require
    def mk(shapeTxt: String): Array[Byte] = {
      val head = s"{'descr': '<f8', 'fortran_order': False, " +
        s"'shape': $shapeTxt, }"
      val pad = (64 - (10 + head.length + 1) % 64) % 64
      val header = head + (" " * pad) + "\n"
      val magic = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 1, 0)
      magic ++ Array[Byte]((header.length & 0xff).toByte,
        ((header.length >> 8) & 0xff).toByte) ++
        header.getBytes("US-ASCII")
    }
    val (s1, d1) = Npy.read(mk("(0,)"))
    assert(s1 === Seq(0) && d1.isEmpty)
    val (s2, d2) = Npy.read(mk("(3, 0)"))
    assert(s2 === Seq(3, 0) && d2.isEmpty)
  }

  test("fortran_order reads transpose into C order") {
    // hand-built 2x3 <i4 fortran file: F-order data [1,4,2,5,3,6]
    // must read back as C-order [1,2,3,4,5,6]
    val head = "{'descr': '<i4', 'fortran_order': True, " +
      "'shape': (2, 3), }"
    val pad = (64 - (10 + head.length + 1) % 64) % 64
    val header = head + (" " * pad) + "\n"
    val bb = java.nio.ByteBuffer
      .allocate(10 + header.length + 24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(0x93.toByte).put('N'.toByte).put('U'.toByte).put('M'.toByte)
      .put('P'.toByte).put('Y'.toByte).put(1.toByte).put(0.toByte)
    bb.putShort(header.length.toShort)
    bb.put(header.getBytes("US-ASCII"))
    Seq(1, 4, 2, 5, 3, 6).foreach(bb.putInt)
    val (shape, data) = Npy.read(bb.array())
    assert(shape === Seq(2, 3))
    assert(data.toSeq === Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
  }

  test("npz container round-trips multiple members") {
    val z = Npy.writeNpz(Seq(
      ("a", Seq(2, 2), Array(1.0, 2.0, 3.0, 4.0)),
      ("b", Seq(3), Array(9.0, 8.0, 7.0))))
    val back = Npy.readNpz(z)
    assert(back.keySet === Set("a", "b"))
    assert(back("a")._1 === Seq(2, 2) &&
      back("a")._2.toSeq === Seq(1.0, 2.0, 3.0, 4.0))
    assert(back("b")._2.toSeq === Seq(9.0, 8.0, 7.0))
  }

  test("rejects are loud and name the gap") {
    assert(intercept[Exception](Npy.read(Array[Byte](1, 2, 3)))
      .getMessage.contains("magic"))
    val bad = Npy.write(Seq(2), Array(1.0, 2.0))
    val s = new String(bad, 10, 20, "US-ASCII")
    val mutated = new String(bad.clone().take(bad.length), "ISO-8859-1")
      .replace("<f8", ">f8").getBytes("ISO-8859-1")
    assert(intercept[Exception](Npy.read(mutated))
      .getMessage.contains(">f8"))
    val truncated = bad.take(bad.length - 8)
    assert(intercept[Exception](Npy.read(truncated))
      .getMessage.contains("truncated"))
  }
}
