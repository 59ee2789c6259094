package graft.io

/** HDF5 built-in N-bit (filter id 5) and scale-offset (filter id 6)
  * filters — the last two real-file read gaps in the HDF5 matrix.
  *
  * Both bitstreams are fully specified by the public HDF5 library
  * behavior (H5Znbit.c / H5Zscaleoffset.c, themselves the normative
  * companion of the fmt3 spec's filter-pipeline message): MSB-first
  * bit packing into the compressed byte stream, per-element byte walks
  * ordered by the datatype's endianness, and (scale-offset only) a
  * 21-byte chunk header of minbits (4 bytes LE) + minval (8 bytes LE)
  * + 9 reserved bytes in front of the packed payload.
  *
  * Decode supports the cases the C library itself implements: atomic
  * little-endian AND big-endian datatypes for n-bit (the byte walk
  * mirrors per the element order; the ARRAY/COMPOUND recursions remain
  * loud rejects — cd describes them, so the error names the gap), and
  * integer / float-D-scale for scale-offset (E-scale is unimplemented
  * in the C library too). Encode exists for the fixture writer so
  * round-trip specs pin the bitstream.
  *
  * Reference behavior spec: xarray reads these through h5py/netCDF-C
  * (reference/xarray/backends/h5netcdf_.py) — the filter layer is
  * below the reference's own code, so the C library IS the spec.
  */
object NbitSO {

  private def mask(bits: Int): Int = if (bits >= 32) -1 else (1 << bits) - 1

  /** Mutable bit cursor over a packed buffer: `j` byte index, `bufLen`
    * bits still unread/unwritten in byte `j` (MSB side first). */
  private final class Cursor { var j = 0; var bufLen = 8 }

  // ------------------------------------------------------------------
  // N-bit (id 5) — cd: [nValid, noNeedFlag, nelmts, class, size, order,
  //                     precision, offset] for the atomic class
  // ------------------------------------------------------------------

  private val NbitAtomic = 1
  private val NbitNoop = 4

  /** Exact packed byte size of an atomic n-bit chunk (for sizing an
    * OUTER deflate's inflate buffer). */
  def nbitPackedSize(cd: Seq[Int]): Int = {
    require(cd.length >= 8 && cd(3) == NbitAtomic,
      s"nbit packed size needs the atomic parameter layout, got $cd")
    val bits = cd(2).toLong * cd(6)
    ((bits + 7) / 8).toInt
  }

  def nbitDecode(raw: Array[Byte], cd: Seq[Int]): Array[Byte] = {
    require(cd.length >= 4, s"nbit cd too short: $cd")
    if (cd(1) != 0) return raw // "no need to compress" flag: identity
    val nelmts = cd(2)
    cd(3) match {
      case NbitNoop =>
        raw // no-op datatype class: stored verbatim
      case NbitAtomic =>
        val size = cd(4); val order = cd(5)
        val prec = cd(6); val off = cd(7)
        require(order == 0 || order == 1,
          s"n-bit atomic byte order $order is neither LE (0) nor BE (1)")
        require(prec > 0 && prec + off <= size * 8,
          s"nbit precision $prec + offset $off exceed size $size bytes")
        val out = new Array[Byte](nelmts * size)
        val cur = new Cursor
        // the packed stream and the per-byte kernel are order-agnostic;
        // the byte WALK differs (H5Z__nbit_decompress_one_atomic): LE
        // descends from the top partial byte to the offset byte, BE
        // ascends — byte 0 is the most significant there, so the window
        // indices mirror around the element
        val (beginI, endI, step) =
          if (order == 0)
            (if ((prec + off) % 8 != 0) (prec + off) / 8
             else (prec + off) / 8 - 1,
             off / 8, -1)
          else
            (if ((prec + off) % 8 != 0) size - (prec + off) / 8 - 1
             else size - (prec + off) / 8,
             size - off / 8 - 1, 1)
        var i = 0
        while (i < nelmts) {
          var k = beginI
          while (if (step < 0) k >= endI else k <= endI) {
            nbitDecodeByte(out, i * size, k, beginI, endI, raw, cur,
              size * 8, prec, off)
            k += step
          }
          i += 1
        }
        out
      case other =>
        sys.error(s"n-bit datatype class $other (array/compound) is not " +
          "implemented — re-encode the variable with an atomic type")
    }
  }

  /** One output byte of one element (H5Z__nbit_decompress_one_byte):
    * pull `datLen` bits MSB-first from the packed stream into byte `k`
    * of the element, at the in-byte position the precision/offset span
    * dictates. */
  private def nbitDecodeByte(data: Array[Byte], dataOff: Int, k: Int,
                             beginI: Int, endI: Int, buf: Array[Byte],
                             c: Cursor, dtypeLen: Int, prec: Int,
                             off: Int): Unit = {
    var datLen = 0; var ucharOff = 0
    if (beginI != endI) {
      if (k == beginI) datLen = 8 - (dtypeLen - prec - off) % 8
      else if (k == endI) { datLen = 8 - off % 8; ucharOff = 8 - datLen }
      else datLen = 8
    } else { ucharOff = off % 8; datLen = prec }
    var v = buf(c.j) & 0xff
    if (c.bufLen > datLen) {
      data(dataOff + k) =
        ((((v >> (c.bufLen - datLen)) & mask(datLen)) << ucharOff)).toByte
      c.bufLen -= datLen
    } else {
      data(dataOff + k) =
        (((v & mask(c.bufLen)) << (datLen - c.bufLen)) << ucharOff).toByte
      datLen -= c.bufLen
      c.j += 1; c.bufLen = 8
      if (datLen != 0) {
        v = buf(c.j) & 0xff
        data(dataOff + k) = (data(dataOff + k) |
          (((v >> (c.bufLen - datLen)) & mask(datLen)) << ucharOff)).toByte
        c.bufLen -= datLen
      }
    }
  }

  /** Fixture-writer encode (mirror of H5Z__nbit_compress, atomic
    * LE/BE). */
  def nbitEncode(data: Array[Byte], cd: Seq[Int]): Array[Byte] = {
    require(cd.length >= 8 && cd(3) == NbitAtomic &&
      (cd(5) == 0 || cd(5) == 1),
      s"nbit encode supports atomic LE/BE only, got $cd")
    if (cd(1) != 0) return data
    val nelmts = cd(2); val size = cd(4); val order = cd(5)
    val prec = cd(6); val off = cd(7)
    require(data.length == nelmts * size,
      s"nbit encode: ${data.length} bytes != $nelmts x $size")
    // loud fit check: packing keeps only bits [off, off+prec) of each
    // element — a value with significant bits outside that window would
    // round-trip corrupted. Accept all-zero high bits (unsigned fit) or
    // the sign-extension of the window's top bit (signed fit); reject
    // any nonzero bits below `off`.
    if (prec + off < size * 8 || off > 0) {
      val total = size * 8
      val hiBits = total - (off + prec)
      var e = 0
      while (e < nelmts) {
        val v =
          if (order == 0) readLeLong(data, e * size, size)
          else readBeLong(data, e * size, size)
        val low = if (off == 0) 0L else v & ((1L << off) - 1)
        val hi =
          if (hiBits == 0) 0L
          else (v >>> (off + prec)) & ((1L << hiBits) - 1)
        val signPat =
          if (hiBits == 0 || ((v >>> (off + prec - 1)) & 1L) == 0L) 0L
          else (1L << hiBits) - 1
        require(low == 0L && (hi == 0L || hi == signPat),
          s"nbit encode: element $e value 0x${v.toHexString} does not " +
            s"fit in bits [$off, ${off + prec}) of a $size-byte type — " +
            "raise the declared precision or fix the fixture")
        e += 1
      }
    }
    val out = new Array[Byte](nbitPackedSize(cd))
    val cur = new Cursor
    // same walk mirror as decode: LE descends, BE ascends
    val (beginI, endI, step) =
      if (order == 0)
        (if ((prec + off) % 8 != 0) (prec + off) / 8
         else (prec + off) / 8 - 1,
         off / 8, -1)
      else
        (if ((prec + off) % 8 != 0) size - (prec + off) / 8 - 1
         else size - (prec + off) / 8,
         size - off / 8 - 1, 1)
    var i = 0
    while (i < nelmts) {
      var k = beginI
      while (if (step < 0) k >= endI else k <= endI) {
        nbitEncodeByte(data, i * size, k, beginI, endI, out, cur,
          size * 8, prec, off)
        k += step
      }
      i += 1
    }
    out
  }

  private def nbitEncodeByte(data: Array[Byte], dataOff: Int, k: Int,
                             beginI: Int, endI: Int, buf: Array[Byte],
                             c: Cursor, dtypeLen: Int, prec: Int,
                             off: Int): Unit = {
    var datLen = 0
    var v = data(dataOff + k) & 0xff
    if (beginI != endI) {
      if (k == beginI) datLen = 8 - (dtypeLen - prec - off) % 8
      else if (k == endI) { datLen = 8 - off % 8; v >>= 8 - datLen }
      else datLen = 8
    } else { datLen = prec; v >>= off % 8 }
    if (c.bufLen > datLen) {
      buf(c.j) =
        (buf(c.j) | ((v & mask(datLen)) << (c.bufLen - datLen))).toByte
      c.bufLen -= datLen
    } else {
      buf(c.j) =
        (buf(c.j) | ((v >> (datLen - c.bufLen)) & mask(c.bufLen))).toByte
      datLen -= c.bufLen
      c.j += 1; c.bufLen = 8
      if (datLen != 0) {
        buf(c.j) = ((v & mask(datLen)) << (c.bufLen - datLen)).toByte
        c.bufLen -= datLen
      }
    }
  }

  // ------------------------------------------------------------------
  // scale-offset (id 6) — cd: [scaleType, scaleFactor, nelmts, class,
  //   size, sign, order, filavail, fill...]; chunk payload = 4-byte LE
  //   minbits + 8-byte LE minval + 9 reserved + packed deltas
  // ------------------------------------------------------------------

  val SoFloatDscale = 0
  val SoInt = 2
  private val SoClsInteger = 0
  private val SoClsFloat = 1
  val SoHeader = 21

  private def ceilLog2(n: Long): Int = {
    require(n >= 1, s"ceilLog2($n)")
    var v = 0; var lower = 1L; var x = n
    while ({ x >>= 1; x != 0 }) { v += 1; lower <<= 1 }
    if (n == lower) v else v + 1
  }

  def soDecode(raw: Array[Byte], cd: Seq[Int]): Array[Byte] = {
    require(cd.length >= 8, s"scaleoffset cd too short: $cd")
    val scaleType = cd(0); val scaleFactor = cd(1); val nelmts = cd(2)
    val cls = cd(3); val size = cd(4); val order = cd(6)
    val filavail = cd(7)
    require(order == 0,
      "scale-offset decode implements little-endian data only")
    require(scaleType == SoInt || scaleType == SoFloatDscale,
      s"scale-offset scale type $scaleType — the C library implements " +
        "INT and FLOAT_DSCALE only (E-scale was never implemented)")
    require(raw.length >= SoHeader,
      s"scale-offset chunk shorter than its $SoHeader-byte header")
    var minbits = 0L
    var i = 0
    while (i < 4) { minbits |= (raw(i) & 0xffL) << (i * 8); i += 1 }
    var minval = 0L
    i = 0
    while (i < 8) { minval |= (raw(4 + i) & 0xffL) << (i * 8); i += 1 }
    val out = new Array[Byte](nelmts * size)
    if (minbits == size * 8L) {
      // full-precision special case: raw copy, NO post-processing (the
      // C filter's early return — values were stored unmodified)
      System.arraycopy(raw, SoHeader, out, 0, out.length)
      return out
    }
    if (minbits > 0) {
      // unpack minbits-bit deltas, MSB-first in the stream (which
      // starts AFTER the 21-byte header), into the LOW bytes of each
      // element (LE walk from begin_i down to 0)
      val cur = new Cursor; cur.j = SoHeader
      val dtypeLen = size * 8
      val beginI = size - 1 - ((dtypeLen - minbits.toInt) / 8)
      var e = 0
      while (e < nelmts) {
        var k = beginI
        while (k >= 0) {
          soDecodeByte(out, e * size, k, beginI, raw, cur, dtypeLen,
            minbits.toInt)
          k -= 1
        }
        e += 1
      }
    }
    // minbits == 0: all deltas zero, out stays zeroed
    // post-decompress: delta -> value
    val bb = java.nio.ByteBuffer.wrap(out)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val fillSentinel = (1L << minbits.toInt) - 1
    if (cls == SoClsInteger) {
      // value = delta + minval (wrapping add reproduces the C cast
      // chain for negative minima); fill-defined chunks reserve the
      // all-ones delta for the fill value
      val filval = if (filavail == 1) soFillFromCd(cd, size) else 0L
      var e = 0
      while (e < nelmts) {
        val pos = e * size
        val delta = readLeLong(out, pos, size)
        val v =
          if (filavail == 1 && minbits != size * 8L &&
            delta == fillSentinel) filval
          else delta + minval
        writeLeLong(bb, pos, size, v)
        e += 1
      }
    } else {
      require(cls == SoClsFloat, s"scale-offset datatype class $cls")
      require(scaleType == SoFloatDscale,
        "float scale-offset decode implements D-scaling only")
      // value = delta / 10^D + min, min = the IEEE bits in minval
      val pow = math.pow(10.0, scaleFactor.toDouble)
      var e = 0
      while (e < nelmts) {
        val pos = e * size
        val delta = readLeLong(out, pos, size)
        if (size == 8) {
          val min = java.lang.Double.longBitsToDouble(minval)
          val v =
            if (filavail == 1 && minbits != 64L && delta == fillSentinel)
              java.lang.Double.longBitsToDouble(soFillFromCd(cd, 8))
            else delta / pow + min
          bb.putDouble(pos, v)
        } else {
          require(size == 4, s"float scale-offset size $size")
          val min = java.lang.Float.intBitsToFloat(minval.toInt)
          val v =
            if (filavail == 1 && minbits != 32L && delta == fillSentinel)
              java.lang.Float.intBitsToFloat(soFillFromCd(cd, 4).toInt)
            else (delta / pow.toFloat + min).toFloat
          bb.putFloat(pos, v)
        }
        e += 1
      }
    }
    out
  }

  /** Fill value bytes live in cd[8..] as little-endian 32-bit words
    * (H5Z__scaleoffset_set_parms_fillval stores the raw bytes). */
  private def soFillFromCd(cd: Seq[Int], size: Int): Long = {
    var v = 0L
    var i = 0
    while (i < size) {
      val word = cd(8 + i / 4)
      v |= ((word >> ((i % 4) * 8)) & 0xffL) << (i * 8)
      i += 1
    }
    v
  }

  private def readLeLong(a: Array[Byte], pos: Int, size: Int): Long = {
    var v = 0L; var i = 0
    while (i < size) { v |= (a(pos + i) & 0xffL) << (i * 8); i += 1 }
    v
  }

  private def readBeLong(a: Array[Byte], pos: Int, size: Int): Long = {
    var v = 0L; var i = 0
    while (i < size) { v = (v << 8) | (a(pos + i) & 0xffL); i += 1 }
    v
  }

  private def writeLeLong(bb: java.nio.ByteBuffer, pos: Int, size: Int,
                          v: Long): Unit = {
    var i = 0
    while (i < size) { bb.put(pos + i, ((v >> (i * 8)) & 0xff).toByte)
      i += 1 }
  }

  /** One byte of one element (H5Z__scaleoffset_decompress_one_byte):
    * unlike n-bit there is no offset, and only the TOP byte of the
    * span carries a partial bit count. */
  private def soDecodeByte(data: Array[Byte], dataOff: Int, k: Int,
                           beginI: Int, buf: Array[Byte], c: Cursor,
                           dtypeLen: Int, minbits: Int): Unit = {
    val datLen0 = if (k == beginI) 8 - (dtypeLen - minbits) % 8 else 8
    var datLen = datLen0
    var v = buf(c.j) & 0xff
    if (c.bufLen > datLen) {
      data(dataOff + k) =
        ((v >> (c.bufLen - datLen)) & mask(datLen)).toByte
      c.bufLen -= datLen
    } else {
      data(dataOff + k) =
        ((v & mask(c.bufLen)) << (datLen - c.bufLen)).toByte
      datLen -= c.bufLen
      c.j += 1; c.bufLen = 8
      if (datLen != 0) {
        v = buf(c.j) & 0xff
        data(dataOff + k) = (data(dataOff + k) |
          ((v >> (c.bufLen - datLen)) & mask(datLen))).toByte
        c.bufLen -= datLen
      }
    }
  }

  private def soEncodeByte(data: Array[Byte], dataOff: Int, k: Int,
                           beginI: Int, buf: Array[Byte], c: Cursor,
                           dtypeLen: Int, minbits: Int): Unit = {
    var datLen = if (k == beginI) 8 - (dtypeLen - minbits) % 8 else 8
    val v = data(dataOff + k) & 0xff
    if (c.bufLen > datLen) {
      buf(c.j) =
        (buf(c.j) | ((v & mask(datLen)) << (c.bufLen - datLen))).toByte
      c.bufLen -= datLen
    } else {
      buf(c.j) =
        (buf(c.j) | ((v >> (datLen - c.bufLen)) & mask(c.bufLen))).toByte
      datLen -= c.bufLen
      c.j += 1; c.bufLen = 8
      if (datLen != 0) {
        buf(c.j) = ((v & mask(datLen)) << (c.bufLen - datLen)).toByte
        c.bufLen -= datLen
      }
    }
  }

  /** Fixture-writer encode: integer values (as signed LE `size`-byte
    * ints in `data`) or D-scaled floats, fill undefined. Computes the
    * per-chunk (minbits, minval) exactly as H5Z__scaleoffset_precompress
    * does and emits header + packed deltas. */
  def soEncode(data: Array[Byte], cd: Seq[Int]): Array[Byte] = {
    val scaleType = cd(0); val scaleFactor = cd(1); val nelmts = cd(2)
    val cls = cd(3); val size = cd(4)
    require(cd(7) == 0, "fixture soEncode writes fill-undefined chunks")
    require(data.length == nelmts * size,
      s"soEncode: ${data.length} bytes != $nelmts x $size")
    // precompress: value -> delta, recording (minbits, minval)
    val deltas = new Array[Long](nelmts)
    var minbits = 0
    var minvalBits = 0L
    if (cls == SoClsInteger) {
      var min = Long.MaxValue; var max = Long.MinValue
      var e = 0
      while (e < nelmts) {
        val v = signExtend(readLeLong(data, e * size, size), size)
        if (v < min) min = v
        if (v > max) max = v
        e += 1
      }
      val span = BigInt(max) - BigInt(min) + 1
      minbits =
        if (scaleFactor > 0) scaleFactor // user-pinned minimum bits
        else ceilLog2(span.toLong)
      require(BigInt(1) << minbits >= span,
        s"scale factor $scaleFactor bits cannot hold span $span")
      if (minbits != size * 8) {
        e = 0
        while (e < nelmts) {
          deltas(e) = signExtend(readLeLong(data, e * size, size),
            size) - min
          e += 1
        }
      } else {
        e = 0
        while (e < nelmts) {
          deltas(e) = readLeLong(data, e * size, size); e += 1 }
      }
      minvalBits = min & (if (size == 8) -1L else (1L << (size * 8)) - 1)
    } else {
      require(cls == SoClsFloat && scaleType == SoFloatDscale,
        "fixture soEncode floats are D-scaled f64")
      require(size == 8, "fixture soEncode floats are f64")
      val pow = math.pow(10.0, scaleFactor.toDouble)
      val bb = java.nio.ByteBuffer.wrap(data)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var min = Double.MaxValue; var max = -Double.MaxValue
      var e = 0
      while (e < nelmts) {
        val v = bb.getDouble(e * size)
        if (v < min) min = v
        if (v > max) max = v
        e += 1
      }
      e = 0
      while (e < nelmts) {
        deltas(e) = math.round(bb.getDouble(e * size) * pow - min * pow)
        e += 1
      }
      val span = math.round(max * pow - min * pow) + 1
      minbits = ceilLog2(span)
      minvalBits = java.lang.Double.doubleToLongBits(min)
    }
    // pack: header + MSB-first minbits-bit deltas
    val packedBytes =
      if (minbits == size * 8) nelmts * size
      else ((nelmts.toLong * minbits + 7) / 8).toInt
    val out = new Array[Byte](SoHeader + packedBytes)
    var i = 0
    while (i < 4) { out(i) = ((minbits >> (i * 8)) & 0xff).toByte; i += 1 }
    i = 0
    while (i < 8) {
      out(4 + i) = ((minvalBits >> (i * 8)) & 0xff).toByte; i += 1 }
    if (minbits == size * 8) {
      System.arraycopy(data, 0, out, SoHeader, data.length)
    } else if (minbits > 0) {
      val deltaBytes = new Array[Byte](nelmts * size)
      val dbb = java.nio.ByteBuffer.wrap(deltaBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var e = 0
      while (e < nelmts) {
        writeLeLong(dbb, e * size, size, deltas(e)); e += 1 }
      val cur = new Cursor; cur.j = SoHeader
      val beginI = size - 1 - ((size * 8 - minbits) / 8)
      e = 0
      while (e < nelmts) {
        var k = beginI
        while (k >= 0) {
          soEncodeByte(deltaBytes, e * size, k, beginI, out, cur,
            size * 8, minbits)
          k -= 1
        }
        e += 1
      }
    }
    out
  }

  private def signExtend(v: Long, size: Int): Long =
    if (size == 8) v
    else {
      val sh = 64 - size * 8
      (v << sh) >> sh
    }
}
