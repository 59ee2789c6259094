package graft.io

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM szip codec — the CCSDS 121.0-B adaptive-Rice entropy coder in
  * the "raw" (headerless) stream layout HDF5's szip filter (id 4) stores.
  *
  * The reference reads szip through libhdf5+libaec
  * (ref `xarray/backends/netCDF4_.py:680` — encodings pass straight to
  * netCDF-C); this is an independent implementation of the public CCSDS
  * 121.0-B-3 format (https://ccsds.org, blue book) so climate-archive
  * netCDF-4 files compress/decompress with zero native dependencies.
  *
  * Stream structure (MSB-first bit order):
  *  - samples are unsigned `bpp`-bit integers (HDF5: 8/16/32, byte order
  *    per the LSB/MSB option bit), grouped into scanlines of `pps`
  *    samples, each scanline into blocks of `ppb` samples (the last block
  *    of a scanline is padded — pad content is ignored on decode);
  *  - NN option: the first sample of each scanline is a raw reference;
  *    every later sample is the unit-delay mapped delta
  *    (2d / -2d-1 / theta+|d|, CCSDS 4.2); EC option codes samples as-is;
  *  - per block, an option ID of `idLen` bits (3 for bpp<=8, 4 for <=16,
  *    5 for <=32): 0 + one extra bit selects the low-entropy options
  *    (0 = zero-block run, 1 = second extension); 1..2^idLen-2 selects
  *    split k = id-1 (FS-coded high parts then k raw LSBs per sample);
  *    all-ones = no compression. A block's reference sample is written
  *    raw immediately after the ID (+ low-entropy bit).
  *  - zero-block runs: FS value z => z+1 blocks (z<=3), rest-of-segment
  *    (z==4, segments = 64 blocks from scanline start), z blocks (z>=5).
  *
  * The encoder never emits low-entropy options for a block holding a
  * reference sample (split/no-comp are always legal there), so the
  * reference-in-low-entropy decode paths are only exercised by foreign
  * writers.
  *
  * HDF5 framing (H5Zszip.c public source): each filtered chunk is a
  * little-endian uint32 byte length of the original data followed by the
  * raw CCSDS stream; client data = [optionMask, bpp, ppb, pps].
  */
object Szip {

  // option-mask bits (szlib.h public API)
  val EcMask = 4
  val LsbMask = 8
  val MsbMask = 16
  val NnMask = 32
  val RawMask = 128

  final case class Params(mask: Int, bpp: Int, ppb: Int, pps: Int) {
    require(Set(8, 16, 32).contains(bpp),
      s"szip bits-per-pixel $bpp unsupported — this reader decodes " +
        "8/16/32-bit samples; re-encode with `h5repack -f GZIP=1` to deflate")
    require(ppb >= 2 && ppb <= 64,
      s"szip pixels-per-block $ppb out of range (2..64)")
    require(pps >= 1, "szip pixels-per-scanline must be positive")
    def idLen: Int = if (bpp <= 8) 3 else if (bpp <= 16) 4 else 5
    def nn: Boolean = (mask & NnMask) != 0
    def littleEndian: Boolean = (mask & MsbMask) == 0
    def bytesPer: Int = bpp / 8
    def maxV: Long = (1L << bpp) - 1
    /** largest split exponent expressible in the ID field */
    def kMax: Int = math.min(bpp - 2, (1 << idLen) - 3)
  }

  // ------------------------------------------------------------------
  // bit IO (MSB-first within each byte, as szip/libaec emit)
  // ------------------------------------------------------------------

  private final class BitW {
    private var buf = new Array[Byte](64)
    private var len = 0
    private var acc = 0L
    private var nAcc = 0
    private def flushByte(): Unit = {
      if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
      buf(len) = ((acc >>> (nAcc - 8)) & 0xff).toByte
      len += 1; nAcc -= 8
      acc &= (1L << nAcc) - 1
    }
    def put(v: Long, n: Int): Unit = {
      var rem = n
      // wide fields in <=24-bit slices keep the accumulator under 64 bits
      while (rem > 24) {
        rem -= 24; put((v >>> rem) & 0xffffff, 24)
      }
      if (rem > 0) {
        acc = (acc << rem) | (v & ((1L << rem) - 1)); nAcc += rem
        while (nAcc >= 8) flushByte()
      }
    }
    /** fundamental sequence: v zeros then a one */
    def fs(v: Long): Unit = {
      var r = v
      while (r >= 24) { put(0L, 24); r -= 24 }
      put(1L, r.toInt + 1)
    }
    def bytes(): Array[Byte] = {
      if (nAcc > 0) { acc <<= (8 - nAcc); nAcc = 8; flushByte() }
      java.util.Arrays.copyOf(buf, len)
    }
  }

  private final class BitR(b: Array[Byte]) {
    private var pos = 0 // bit cursor
    def get(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) {
        require(pos < b.length * 8, "szip stream truncated")
        v = (v << 1) | ((b(pos >>> 3) >>> (7 - (pos & 7))) & 1)
        pos += 1; i += 1
      }
      v
    }
    def fs(): Long = {
      var v = 0L
      while ({ require(pos < b.length * 8, "szip stream truncated")
               val bit = (b(pos >>> 3) >>> (7 - (pos & 7))) & 1
               pos += 1
               bit == 0 }) v += 1
      v
    }
  }

  // ------------------------------------------------------------------
  // CCSDS 4.2 unit-delay preprocessor
  // ------------------------------------------------------------------

  private def mapDelta(x: Long, pred: Long, maxV: Long): Long = {
    val d = x - pred
    val theta = math.min(pred, maxV - pred)
    if (d >= 0 && d <= theta) 2 * d
    else if (d < 0 && -d <= theta) -2 * d - 1
    else theta + math.abs(d)
  }

  private def unmapDelta(m: Long, pred: Long, maxV: Long): Long = {
    val theta = math.min(pred, maxV - pred)
    val d =
      if (m <= 2 * theta) { if (m % 2 == 0) m / 2 else -((m + 1) / 2) }
      else if (maxV - pred > pred) m - theta // only the long side reaches
      else -(m - theta)
    pred + d
  }

  // ------------------------------------------------------------------
  // encode
  // ------------------------------------------------------------------

  /** Compress unsigned `bpp`-bit samples (values in [0, 2^bpp)). */
  def compress(samples: Array[Long], p: Params): Array[Byte] = {
    val w = new BitW
    var s0 = 0
    while (s0 < samples.length) {
      val n = math.min(p.pps, samples.length - s0)
      encodeScanline(samples, s0, n, p, w)
      s0 += n
    }
    w.bytes()
  }

  private def encodeScanline(xs: Array[Long], off: Int, n: Int,
                             p: Params, w: BitW): Unit = {
    // mapped-domain view of the scanline, padded to whole blocks
    val nBlocks = (n + p.ppb - 1) / p.ppb
    val m = new Array[Long](nBlocks * p.ppb)
    if (p.nn) {
      m(0) = xs(off) // raw reference, emitted specially
      var i = 1
      var pred = xs(off)
      while (i < n) {
        m(i) = mapDelta(xs(off + i), pred, p.maxV); pred = xs(off + i)
        i += 1
      }
    } else {
      var i = 0
      while (i < n) { m(i) = xs(off + i); i += 1 }
    }
    var b = 0
    while (b < nBlocks) {
      val hasRef = p.nn && b == 0
      if (!hasRef && blockZero(m, b * p.ppb, p.ppb)) {
        // extend the zero run, stopping at scanline end or a 64-block
        // segment boundary (whichever first)
        val segEnd = math.min(((b / 64) + 1) * 64, nBlocks)
        var e = b
        while (e < segEnd && blockZero(m, e * p.ppb, p.ppb)) e += 1
        val run = e - b
        w.put(0L, p.idLen + 1) // ID 0 + low-entropy bit 0
        if (e == segEnd) w.fs(4L) // rest-of-segment
        else if (run <= 4) w.fs(run - 1L)
        else w.fs(run.toLong)
        b = e
      } else {
        encodeBlock(m, b * p.ppb, hasRef, p, w)
        b += 1
      }
    }
  }

  private def blockZero(m: Array[Long], off: Int, j: Int): Boolean = {
    var i = 0
    while (i < j) { if (m(off + i) != 0) return false; i += 1 }
    true
  }

  private def encodeBlock(m: Array[Long], off: Int, hasRef: Boolean,
                          p: Params, w: BitW): Unit = {
    val d0 = off + (if (hasRef) 1 else 0)
    val cnt = p.ppb - (if (hasRef) 1 else 0)
    // cost of each split k (FS part = value>>k zeros + terminator)
    var bestK = -1
    var bestCost = cnt.toLong * p.bpp // no-compression
    var k = 0
    while (k <= p.kMax) {
      var c = cnt.toLong * (k + 1)
      var i = 0
      while (i < cnt) { c += m(d0 + i) >>> k; i += 1 }
      if (c < bestCost) { bestCost = c; bestK = k }
      k += 1
    }
    // second extension: pairs mapped through the diagonal enumeration;
    // never chosen for a reference block (see scaladoc)
    var useSe = false
    if (!hasRef && cnt % 2 == 0) {
      var c = cnt.toLong / 2 + 1 // +1: the extra low-entropy bit
      var i = 0
      while (i < cnt && c < bestCost) {
        val s = m(d0 + i) + m(d0 + i + 1)
        // pair values beyond ~2^20 cannot win; avoid s*(s+1)/2 overflow
        if (s > (1L << 20)) c = Long.MaxValue
        else c += s * (s + 1) / 2 + m(d0 + i + 1)
        i += 2
      }
      if (i >= cnt && c < bestCost) { bestCost = c; useSe = true }
    }
    if (useSe) {
      w.put(0L, p.idLen); w.put(1L, 1)
      var i = 0
      while (i < cnt) {
        val s = m(d0 + i) + m(d0 + i + 1)
        w.fs(s * (s + 1) / 2 + m(d0 + i + 1)); i += 2
      }
    } else if (bestK < 0) {
      w.put((1 << p.idLen) - 1L, p.idLen) // no compression
      if (hasRef) w.put(m(off), p.bpp)
      var i = 0
      while (i < cnt) { w.put(m(d0 + i), p.bpp); i += 1 }
    } else {
      w.put(bestK + 1L, p.idLen)
      if (hasRef) w.put(m(off), p.bpp)
      var i = 0
      while (i < cnt) { w.fs(m(d0 + i) >>> bestK); i += 1 }
      if (bestK > 0) {
        i = 0
        while (i < cnt) { w.put(m(d0 + i), bestK); i += 1 }
      }
    }
  }

  // ------------------------------------------------------------------
  // decode
  // ------------------------------------------------------------------

  /** Decompress to exactly `nSamples` unsigned samples. */
  def decompress(bytes: Array[Byte], nSamples: Int, p: Params): Array[Long] = {
    val r = new BitR(bytes)
    val out = new Array[Long](nSamples)
    var s0 = 0
    while (s0 < nSamples) {
      val n = math.min(p.pps, nSamples - s0)
      decodeScanline(out, s0, n, p, r)
      s0 += n
    }
    out
  }

  private def decodeScanline(out: Array[Long], off: Int, n: Int,
                             p: Params, r: BitR): Unit = {
    val nBlocks = (n + p.ppb - 1) / p.ppb
    val m = new Array[Long](nBlocks * p.ppb)
    var ref = 0L
    var b = 0
    while (b < nBlocks) {
      val hasRef = p.nn && b == 0
      val id = r.get(p.idLen).toInt
      if (id == 0 && r.get(1) == 0) {
        // zero-block run (reference block: raw ref precedes the count)
        if (hasRef) ref = r.get(p.bpp)
        val z = r.fs()
        val segEnd = math.min(((b / 64) + 1) * 64, nBlocks)
        val run =
          if (z == 4) segEnd - b
          else if (z <= 3) z.toInt + 1
          else z.toInt
        b += run // mapped samples already zero
      } else {
        if (hasRef) ref = r.get(p.bpp)
        val d0 = b * p.ppb + (if (hasRef) 1 else 0)
        val cnt = p.ppb - (if (hasRef) 1 else 0)
        if (id == 0) {
          // second extension; a foreign reference block pairs a phantom
          // leading zero with the first delta — the phantom is DISCARDED
          // (only the pair's second member is a real sample)
          var out2 = d0
          var first = hasRef
          while (out2 < d0 + cnt) {
            val v = r.fs()
            // invert m = s(s+1)/2 + b2 without floating point
            var s = 0L
            while ((s + 1) * (s + 2) / 2 <= v) s += 1
            val b2 = v - s * (s + 1) / 2
            if (first) { m(out2) = b2; out2 += 1; first = false }
            else {
              m(out2) = s - b2
              if (out2 + 1 < d0 + cnt) m(out2 + 1) = b2
              out2 += 2
            }
          }
        } else if (id == (1 << p.idLen) - 1) {
          var i = 0
          while (i < cnt) { m(d0 + i) = r.get(p.bpp); i += 1 }
        } else {
          val k = id - 1
          var i = 0
          while (i < cnt) { m(d0 + i) = r.fs() << k; i += 1 }
          if (k > 0) {
            i = 0
            while (i < cnt) { m(d0 + i) |= r.get(k); i += 1 }
          }
        }
        b += 1
      }
    }
    if (p.nn) {
      out(off) = ref
      var pred = ref
      var i = 1
      while (i < n) {
        pred = unmapDelta(m(i), pred, p.maxV); out(off + i) = pred
        i += 1
      }
    } else {
      var i = 0
      while (i < n) { out(off + i) = m(i); i += 1 }
    }
  }

  // ------------------------------------------------------------------
  // HDF5 chunk framing + byte<->sample marshalling
  // ------------------------------------------------------------------

  def paramsFromCd(cd: Seq[Int]): Params = {
    require(cd.length >= 4,
      s"szip client data has ${cd.length} values, expected " +
        "[mask, bpp, pixels/block, pixels/scanline]")
    Params(cd(0), cd(1), cd(2), cd(3))
  }

  private def toSamples(raw: Array[Byte], p: Params): Array[Long] = {
    val bp = p.bytesPer
    require(raw.length % bp == 0,
      s"szip input of ${raw.length} bytes is not a whole number of " +
        s"$bp-byte samples")
    val b = ByteBuffer.wrap(raw).order(
      if (p.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    Array.tabulate(raw.length / bp) { _ =>
      bp match {
        case 1 => b.get() & 0xffL
        case 2 => b.getShort() & 0xffffL
        case _ => b.getInt() & 0xffffffffL
      }
    }
  }

  private def fromSamples(s: Array[Long], p: Params): Array[Byte] = {
    val bp = p.bytesPer
    val b = ByteBuffer.allocate(s.length * bp).order(
      if (p.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    s.foreach { v =>
      bp match {
        case 1 => b.put(v.toByte)
        case 2 => b.putShort(v.toShort)
        case _ => b.putInt(v.toInt)
      }
    }
    b.array()
  }

  /** Filter a chunk the way H5Z_filter_szip stores it: LE uint32 original
    * byte length, then the raw CCSDS stream. */
  def hdf5Encode(raw: Array[Byte], cd: Seq[Int]): Array[Byte] = {
    val p = paramsFromCd(cd)
    val stream = compress(toSamples(raw, p), p)
    val out = ByteBuffer.allocate(4 + stream.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(raw.length).put(stream)
    out.array()
  }

  def hdf5Decode(chunk: Array[Byte], cd: Seq[Int], what: String): Array[Byte] = {
    val p = paramsFromCd(cd)
    require(chunk.length >= 4, s"szip chunk of $what shorter than its header")
    val orig = ByteBuffer.wrap(chunk, 0, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt
    require(orig >= 0 && orig % p.bytesPer == 0,
      s"szip chunk of $what declares invalid original size $orig")
    val stream = java.util.Arrays.copyOfRange(chunk, 4, chunk.length)
    fromSamples(decompress(stream, orig / p.bytesPer, p), p)
  }
}
