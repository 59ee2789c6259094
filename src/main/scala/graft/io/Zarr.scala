package graft.io

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Real zarr v2 store reader/writer (ref `backends/zarr.py:655`,
  * `open_zarr` `backends/zarr.py:1222`; format: the public zarr v2 spec,
  * zarr.readthedocs.io "Zarr storage specification version 2").
  *
  * Store model: a directory; `.zgroup` = `{"zarr_format":2}`; each array
  * is a subdirectory with `.zarray` (shape/chunks/dtype/compressor/
  * fill_value/order), optional `.zattrs`, and chunk files named by their
  * grid index joined with `dimension_separator` (default "."). A chunk is
  * the C-order encoding of a FULL chunk box (edge chunks padded with
  * `fill_value`), then compressed. Dimension names follow the xarray
  * convention: `_ARRAY_DIMENSIONS` in `.zattrs`.
  *
  * Codecs: `null` (raw), `zlib` (`numcodecs.Zlib`, plain DEFLATE via
  * `java.util.zip`), `zstd` (`numcodecs.Zstd` in v2 and the v3 `zstd`
  * codec — zarr-python 3's default chain — via the zstd-jni Spark
  * bundles), and `blosc` — zarr-python 2's DEFAULT — decoded pure-JVM by
  * [[Blosc]] for the lz4/lz4hc/zstd/zlib/snappy inner codecs
  * (no-shuffle, byte-shuffle, and bit-shuffle; blosclz is rejected
  * with re-encode guidance). Pass compressor id "blosc:<cname>:<shuffle>"
  * to write blosc-framed chunks. The v3 `transpose` array->array codec
  * reads and writes at the top level of the chain (inside
  * sharding_indexed it is rejected with guidance).
  *
  * 100 TB shape: chunks are independently decodable, so the reader maps
  * one Spark task per chunk file (`binaryFile` source — no driver
  * bottleneck) and the writer shuffles rows once by chunk id and encodes
  * each chunk entirely inside an executor; memory is bounded by one chunk
  * box, never by the array. Only the tiny JSON metadata and the 1-D
  * coordinate vectors touch the driver (the same contract as the
  * reference, which holds every coordinate index in memory).
  */
object Zarr {

  /** Parsed array metadata — v2 `.zarray` + `.zattrs`, or a v3
    * `zarr.json` array node mapped onto the same fields. `dtype` is
    * (byteOrder, kind, size), e.g. ('<','f',8). `v3` switches the chunk
    * key scheme (v2 `"0.0"` flat names vs v3 `"c/0/0"` nested) and the
    * metadata emitter; the chunk PAYLOAD pipeline is shared. */
  /** zarr v3 `sharding_indexed` codec configuration (spec: one storage
    * object — the SHARD — holds a grid of independently-compressed inner
    * chunks plus a binary (offset, nbytes) index). `inner` is the inner
    * chunk shape (must divide the outer chunk/shard shape evenly);
    * `innerComp` the inner chunks' compressor; `indexAtEnd` the
    * index_location; `indexCrc` whether the index carries a crc32c. */
  case class ShardSpec(inner: Seq[Int],
                       innerComp: Option[(String, Int)],
                       indexAtEnd: Boolean = true,
                       indexCrc: Boolean = true)

  case class ArrayMeta(shape: Seq[Int], chunks: Seq[Int],
                       order: Char, kind: Char, size: Int,
                       compressor: Option[(String, Int)],
                       fillValue: Double, separator: String,
                       dims: Seq[String], attrs: Map[String, String],
                       v3: Boolean = false,
                       shard: Option[ShardSpec] = None,
                       tperm: Option[Seq[Int]] = None) {
    def integral: Boolean = kind == 'i' || kind == 'u'
    def chunkGrid: Seq[Int] =
      shape.zip(chunks).map { case (s, c) => (s + c - 1) / c }
    def chunkElems: Int = chunks.product
    def chunkKey(ci: Seq[Int]): String =
      if (v3) "c" + separator + ci.mkString(separator)
      else ci.mkString(separator)
  }

  // ------------------------------------------------------------------
  // metadata
  // ------------------------------------------------------------------

  private def fsFor(path: String, spark: SparkSession): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readBytes(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  private def writeBytes(fs: FileSystem, p: Path, b: Array[Byte]): Unit = {
    val out = fs.create(p, true)
    try out.write(b) finally out.close()
  }

  def parseDtype(s: String): (Char, Char, Int) = {
    require(s.length >= 3, s"bad dtype '$s'")
    val order = s.charAt(0) // '<' | '>' | '|'
    val kind = s.charAt(1)  // 'f' | 'i' | 'u'
    val size = s.substring(2).toInt
    require("<>|".contains(order) && "fiu".contains(kind),
      s"unsupported dtype '$s'")
    (order, kind, size)
  }

  def parseMeta(zarray: String, zattrs: Option[String]): ArrayMeta = {
    val j = JsonMethods.parse(zarray)
    def ints(field: String): Seq[Int] = (j \ field) match {
      case JArray(xs) => xs.map {
        case JInt(i) => i.toInt
        case JLong(l) => l.toInt
        case other => sys.error(s"bad $field entry $other")
      }
      case other => sys.error(s"bad $field $other")
    }
    val (ord, kind, size) = (j \ "dtype") match {
      case JString(s) => parseDtype(s)
      case other => sys.error(s"bad dtype $other")
    }
    val comp = (j \ "compressor") match {
      case JNull | JNothing => None
      case c =>
        val id = (c \ "id") match { case JString(s) => s; case _ => "?" }
        def int(field: String, dflt: Int): Int = (c \ field) match {
          case JInt(i) => i.toInt; case JLong(l) => l.toInt; case _ => dflt
        }
        id match {
          case "zlib" => Some((id, int("level", 1)))
          case "zstd" => Some((id, int("level", 1))) // numcodecs Zstd
          case "blosc" =>
            // numcodecs Blosc carries cname/clevel/shuffle; pack cname and
            // shuffle into the id ("blosc:<cname>:<shuffle>") so the
            // (String, Int) compressor slot round-trips the write config
            Some((s"blosc:${(c \ "cname") match {
              case JString(s) => s; case _ => "lz4"
            }}:${int("shuffle", 1)}", int("clevel", 5)))
          case other => sys.error(
            s"unsupported compressor '$other' (supported: null, zlib, " +
              "zstd, blosc[lz4/lz4hc/zstd/zlib/snappy])")
        }
    }
    val fill = (j \ "fill_value") match {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case JLong(l) => l.toDouble
      case JDecimal(d) => d.toDouble
      case JString("NaN") => Double.NaN
      case _ => Double.NaN // JSON null -> NaN (float) / unused (int)
    }
    val sep = (j \ "dimension_separator") match {
      case JString(s) => s
      case _ => "."
    }
    // v2 "order": F(ortran) chunks are the C-order encoding of the
    // REVERSED-dims box — exactly the transpose codec at the reversal
    // permutation, so the same remap path decodes them (read side; the
    // writer always emits C like zarr-python's default)
    val forder: Option[Seq[Int]] = (j \ "order") match {
      case JString("C") | JNothing => None
      case JString("F") => Some(ints("chunks").indices.reverse)
      case other => sys.error(s"unsupported order $other (C or F)")
    }
    (j \ "filters") match {
      case JNull | JNothing | JArray(Nil) =>
      case other => sys.error(s"unsupported filters $other")
    }
    val (dims, attrs) = zattrs.map { s =>
      val a = JsonMethods.parse(s)
      val d = (a \ "_ARRAY_DIMENSIONS") match {
        case JArray(xs) => xs.collect { case JString(n) => n }
        case _ => Nil
      }
      val rest = a match {
        case JObject(fields) => fields.collect {
          case (k, JString(v)) if k != "_ARRAY_DIMENSIONS" => k -> v
        }.toMap
        case _ => Map.empty[String, String]
      }
      (d, rest)
    }.getOrElse((Nil, Map.empty[String, String]))
    ArrayMeta(ints("shape"), ints("chunks"), ord, kind, size, comp, fill,
      sep, dims, attrs, tperm = forder)
  }

  def openMeta(spark: SparkSession, store: String, name: String): ArrayMeta = {
    val fs = fsFor(store, spark)
    val za = new String(readBytes(fs, new Path(store, s"$name/.zarray")), "UTF-8")
    val attrsPath = new Path(store, s"$name/.zattrs")
    val zat = if (fs.exists(attrsPath))
      Some(new String(readBytes(fs, attrsPath), "UTF-8")) else None
    parseMeta(za, zat)
  }

  /** v3 dtype names <-> the (kind, size) pair (spec table; the byte order
    * lives in the `bytes` codec, not the dtype). */
  private val v3Dtypes: Map[String, (Char, Int)] = Map(
    "float64" -> ('f', 8), "float32" -> ('f', 4),
    "int64" -> ('i', 8), "int32" -> ('i', 4), "int16" -> ('i', 2),
    "int8" -> ('i', 1), "uint8" -> ('u', 1), "uint16" -> ('u', 2),
    "uint32" -> ('u', 4))

  /** Parse a zarr v3 array node (`zarr.json`, zarr_format 3): regular
    * chunk grid, `default` chunk key encoding ("c/"-prefixed, "/"
    * separated), `bytes` codec (endianness) + optional `gzip` codec.
    * `dimension_names` and `attributes` live inline — v3 needs no
    * `.zattrs` sidecar or `_ARRAY_DIMENSIONS` convention. */
  def parseMetaV3(zarrJson: String): ArrayMeta = {
    val j = JsonMethods.parse(zarrJson)
    (j \ "zarr_format") match {
      case JInt(v) if v == 3 =>
      case other => sys.error(s"not a zarr v3 node (zarr_format $other)")
    }
    (j \ "node_type") match {
      case JString("array") =>
      case other => sys.error(s"not an array node ($other)")
    }
    def ints(v: JValue): Seq[Int] = v match {
      case JArray(xs) => xs.map {
        case JInt(i) => i.toInt
        case JLong(l) => l.toInt
        case other => sys.error(s"bad int entry $other")
      }
      case other => sys.error(s"bad int array $other")
    }
    val shape = ints(j \ "shape")
    (j \ "chunk_grid" \ "name") match {
      case JString("regular") =>
      case other => sys.error(s"unsupported chunk_grid $other")
    }
    val chunks = ints(j \ "chunk_grid" \ "configuration" \ "chunk_shape")
    (j \ "chunk_key_encoding" \ "name") match {
      case JString("default") | JNothing =>
      case other => sys.error(s"unsupported chunk_key_encoding $other")
    }
    // the default encoding's separator is configurable ("/" nested dirs or
    // "." flat "c.0.0" files) — honour it rather than assuming "/"
    val sep = (j \ "chunk_key_encoding" \ "configuration" \ "separator") match {
      case JString(s) => require(s == "/" || s == ".",
        s"unsupported chunk key separator '$s'"); s
      case _ => "/"
    }
    val (kind, size) = (j \ "data_type") match {
      case JString(s) => v3Dtypes.getOrElse(s,
        sys.error(s"unsupported v3 data_type $s"))
      case other => sys.error(s"bad data_type $other")
    }
    var order: Char = '<'
    var comp: Option[(String, Int)] = None
    var shard: Option[ShardSpec] = None
    var tperm: Option[Seq[Int]] = None
    // v3 blosc codec config -> the same packed "blosc:<cname>:<shuffle>"
    // id the v2 path uses (shuffle is a string enum in v3)
    def bloscOf(c: JValue): (String, Int) = {
      val cfg = c \ "configuration"
      val cname = (cfg \ "cname") match {
        case JString(s) => s; case _ => "lz4"
      }
      val shuffle = (cfg \ "shuffle") match {
        case JString("noshuffle") => 0
        case JString("bitshuffle") => 2
        case _ => 1
      }
      val clevel = (cfg \ "clevel") match {
        case JInt(l) => l.toInt; case JLong(l) => l.toInt; case _ => 5
      }
      (s"blosc:$cname:$shuffle", clevel)
    }
    // a plain codec chain is bytes [+ gzip|blosc]; parse into (endian, comp)
    def parseChain(v: JValue): (Char, Option[(String, Int)]) = {
      var o: Char = '<'; var cm: Option[(String, Int)] = None
      v match {
        case JArray(cs) => cs.foreach { c =>
          (c \ "name") match {
            case JString("bytes") => (c \ "configuration" \ "endian") match {
              case JString("big") => o = '>'
              case _ => o = '<'
            }
            case JString("gzip") => (c \ "configuration" \ "level") match {
              case JInt(l) => cm = Some(("gzip", l.toInt))
              case _ => cm = Some(("gzip", 1))
            }
            case JString("blosc") => cm = Some(bloscOf(c))
            case JString("zstd") => (c \ "configuration" \ "level") match {
              case JInt(l) => cm = Some(("zstd", l.toInt))
              case _ => cm = Some(("zstd", 0))
            }
            case JString("transpose") =>
              sys.error("transpose inside sharding_indexed is not " +
                "supported — re-encode with the transpose codec at the " +
                "top level (or without it)")
            case JString(other) =>
              sys.error(
                s"unsupported v3 codec '$other' (bytes, gzip, blosc, zstd)")
            case other => sys.error(s"bad codec $other")
          }
        }
        case other => sys.error(s"bad codecs $other")
      }
      (o, cm)
    }
    (j \ "codecs") match {
      case JArray(cs) => cs.foreach { c =>
        (c \ "name") match {
          case JString("sharding_indexed") =>
            val cfg = c \ "configuration"
            val inner = ints(cfg \ "chunk_shape")
            val (io, icm) = parseChain(cfg \ "codecs")
            order = io
            val crc = (cfg \ "index_codecs") match {
              case JArray(ics) => ics.exists(ic =>
                (ic \ "name") == JString("crc32c"))
              case _ => true
            }
            val atEnd = (cfg \ "index_location") match {
              case JString("start") => false
              case _ => true
            }
            shard = Some(ShardSpec(inner, icm, atEnd, crc))
          case JString("bytes") => (c \ "configuration" \ "endian") match {
            case JString("big") => order = '>'
            case _ => order = '<'
          }
          case JString("gzip") => (c \ "configuration" \ "level") match {
            case JInt(l) => comp = Some(("gzip", l.toInt))
            case _ => comp = Some(("gzip", 1))
          }
          case JString("blosc") => comp = Some(bloscOf(c))
          case JString("zstd") => (c \ "configuration" \ "level") match {
            case JInt(l) => comp = Some(("zstd", l.toInt))
            case _ => comp = Some(("zstd", 0))
          }
          case JString("transpose") =>
            // array->array codec (v3 spec §transpose): the encoded chunk
            // has shape chunk_shape[order[i]]; decode inverse-permutes.
            // Stacked transposes compose — reject rather than silently
            // applying only the last one (same policy as bitshuffle).
            require(tperm.isEmpty,
              "multiple transpose codecs in one chain are not supported " +
                "— re-encode with the composed permutation")
            val p = ints(c \ "configuration" \ "order")
            require(p.length == chunks.length &&
              p.sorted == chunks.indices.toList,
              s"transpose order $p is not a permutation of the " +
                s"${chunks.length} chunk dims")
            tperm = Some(p)
          case JString(other) =>
            sys.error(s"unsupported v3 codec '$other' " +
              "(bytes, gzip, blosc, zstd, transpose, sharding_indexed)")
          case other => sys.error(s"bad codec $other")
        }
      }
      case other => sys.error(s"bad codecs $other")
    }
    val fill = (j \ "fill_value") match {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case JLong(l) => l.toDouble
      case JDecimal(d) => d.toDouble
      case JString("NaN") => Double.NaN
      case _ => Double.NaN
    }
    val dims = (j \ "dimension_names") match {
      case JArray(xs) => xs.collect { case JString(n) => n }
      case _ => Nil
    }
    val attrs = (j \ "attributes") match {
      case JObject(fields) => fields.collect {
        case (k, JString(v)) => k -> v
      }.toMap
      case _ => Map.empty[String, String]
    }
    shard.foreach { sh =>
      require(sh.inner.length == chunks.length &&
        sh.inner.zip(chunks).forall { case (i, c) => i > 0 && c % i == 0 },
        s"inner chunk shape ${sh.inner} must divide the shard shape $chunks")
    }
    ArrayMeta(shape, chunks, order, kind, size, comp, fill, sep, dims,
      attrs, v3 = true, shard = shard, tperm = tperm)
  }

  /** Open either format's metadata: a `zarr.json` array node wins (v3),
    * else the v2 `.zarray`/`.zattrs` pair. All readers go through this,
    * so `toLongDF`/`openDataset`/`readArray` are format-transparent. */
  def openMetaAny(spark: SparkSession, store: String, name: String): ArrayMeta = {
    val fs = fsFor(store, spark)
    val v3Path = new Path(store, s"$name/zarr.json")
    if (fs.exists(v3Path))
      parseMetaV3(new String(readBytes(fs, v3Path), "UTF-8"))
    else openMeta(spark, store, name)
  }

  // ------------------------------------------------------------------
  // chunk codec
  // ------------------------------------------------------------------

  private def inflate(b: Array[Byte], expect: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(b)
    val out = new Array[Byte](expect)
    var off = 0
    while (off < expect && !inf.finished()) {
      val n = inf.inflate(out, off, expect - off)
      require(n > 0 || !inf.needsInput(), "truncated zlib chunk")
      off += n
    }
    inf.end()
    require(off == expect, s"zlib chunk decoded $off of $expect bytes")
    out
  }

  /** zstd frame (numcodecs Zstd in v2; the v3 `zstd` codec — zarr-python
    * 3's default chain) via the zstd-jni Spark already bundles. */
  private def unzstd(b: Array[Byte], expect: Int): Array[Byte] = {
    val out = new Array[Byte](expect)
    val n = com.github.luben.zstd.Zstd.decompressByteArray(
      out, 0, expect, b, 0, b.length)
    require(n == expect, s"zstd chunk decoded $n of $expect bytes")
    out
  }

  private def deflate(b: Array[Byte], level: Int): Array[Byte] = {
    val d = new Deflater(level)
    d.setInput(b); d.finish()
    val out = new ByteArrayOutputStream(b.length / 2 max 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  // v3's standard byte-stream codec is gzip (RFC 1952 framing), not v2's
  // raw zlib (RFC 1950) — java.util.zip provides both
  private def gunzip(b: Array[Byte], expect: Int): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    val out = new Array[Byte](expect)
    var off = 0
    try {
      while (off < expect) {
        val n = in.read(out, off, expect - off)
        require(n > 0, s"gzip chunk decoded $off of $expect bytes")
        off += n
      }
      require(in.read() < 0, "gzip chunk longer than expected")
    } finally in.close()
    out
  }

  private def gzip(b: Array[Byte], level: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream(b.length / 2 max 64)
    val gz = new java.util.zip.GZIPOutputStream(bos) {
      `def`.setLevel(level)
    }
    gz.write(b); gz.close()
    bos.toByteArray
  }

  /** Decode one chunk file's payload to doubles in C order (full chunk
    * box — caller trims edge padding via global-index bounds). A sharded
    * array's "chunk file" is the whole SHARD; it decodes transparently to
    * the same full outer box, so every reader path is shard-agnostic. */
  /** transpose codec remap between the chunk's LOGICAL C-order layout
    * (shape = chunks) and its STORED C-order layout (shape =
    * chunks[p(i)]). `toStored=true` is the encode direction. One div-free
    * odometer walk over the stored index space; logical offsets accumulate
    * through the permuted strides. */
  private def permuteChunk(src: Array[Double], chunks: Seq[Int],
                           p: Seq[Int], toStored: Boolean): Array[Double] = {
    val d = chunks.length
    val s = chunks.toArray
    val t = p.map(s(_)).toArray                        // stored shape
    val strideS = new Array[Int](d)                    // logical C strides
    var acc = 1
    var k = d - 1
    while (k >= 0) { strideS(k) = acc; acc *= s(k); k -= 1 }
    val strideL = p.map(strideS(_)).toArray            // logical stride of
    val out = new Array[Double](src.length)            // stored axis i
    val idx = new Array[Int](d)
    var ls = 0                                         // stored linear
    var ll = 0                                         // logical linear
    while (ls < src.length) {
      if (toStored) out(ls) = src(ll) else out(ll) = src(ls)
      var i = d - 1
      var carry = true
      while (carry && i >= 0) {
        idx(i) += 1; ll += strideL(i)
        if (idx(i) < t(i)) carry = false
        else { ll -= idx(i) * strideL(i); idx(i) = 0; i -= 1 }
      }
      ls += 1
    }
    out
  }

  def decodeChunk(raw: Array[Byte], m: ArrayMeta): Array[Double] = {
    m.shard match {
      case Some(sh) => return decodeShard(raw, m, sh)
      case None =>
    }
    val n = m.chunkElems
    val plain = m.compressor match {
      case Some(("zlib", _)) => inflate(raw, n * m.size)
      case Some(("gzip", _)) => gunzip(raw, n * m.size)
      case Some(("zstd", _)) => unzstd(raw, n * m.size)
      // the blosc frame header self-describes codec/shuffle/split — the
      // packed id only matters for writes
      case Some((id, _)) if id.startsWith("blosc") =>
        Blosc.decompress(raw, n * m.size)
      case None => { require(raw.length >= n * m.size, "short raw chunk"); raw }
      case Some((id, _)) => sys.error(s"unsupported compressor $id")
    }
    val buf = ByteBuffer.wrap(plain, 0, n * m.size)
    buf.order(if (m.order == '>') ByteOrder.BIG_ENDIAN
              else ByteOrder.LITTLE_ENDIAN)
    val vals = Array.tabulate(n) { _ =>
      (m.kind, m.size) match {
        case ('f', 8) => buf.getDouble()
        case ('f', 4) => buf.getFloat().toDouble
        case ('i', 8) => buf.getLong().toDouble
        case ('i', 4) => buf.getInt().toDouble
        case ('i', 2) => buf.getShort().toDouble
        case ('i', 1) => buf.get().toDouble
        case ('u', 1) => (buf.get() & 0xff).toDouble
        case ('u', 2) => (buf.getShort() & 0xffff).toDouble
        case ('u', 4) => (buf.getInt() & 0xffffffffL).toDouble
        case (k, s) => sys.error(s"unsupported dtype $k$s")
      }
    }
    m.tperm match {
      case Some(p) => permuteChunk(vals, m.chunks, p, toStored = false)
      case None => vals
    }
  }

  private def encodeChunk(vals0: Array[Double], m: ArrayMeta): Array[Byte] = {
    m.shard match {
      case Some(sh) => return encodeShard(vals0, m, sh)
      case None =>
    }
    val vals = m.tperm match {
      case Some(p) => permuteChunk(vals0, m.chunks, p, toStored = true)
      case None => vals0
    }
    val buf = ByteBuffer.allocate(vals.length * m.size)
    buf.order(if (m.order == '>') ByteOrder.BIG_ENDIAN
              else ByteOrder.LITTLE_ENDIAN)
    vals.foreach { x =>
      (m.kind, m.size) match {
        case ('f', 8) => buf.putDouble(x)
        case ('f', 4) => buf.putFloat(x.toFloat)
        case ('i', 8) => buf.putLong(x.toLong)
        case ('i', 4) => buf.putInt(x.toInt)
        case ('i', 2) => buf.putShort(x.toShort)
        case ('i', 1) => buf.put(x.toByte)
        case ('u', 1) => buf.put((x.toInt & 0xff).toByte)
        case ('u', 2) => buf.putShort((x.toInt & 0xffff).toShort)
        case ('u', 4) => buf.putInt((x.toLong & 0xffffffffL).toInt)
        case (k, s) => sys.error(s"unsupported dtype $k$s")
      }
    }
    m.compressor match {
      case Some(("zlib", lvl)) => deflate(buf.array(), lvl)
      case Some(("gzip", lvl)) => gzip(buf.array(), lvl)
      case Some(("zstd", lvl)) =>
        com.github.luben.zstd.Zstd.compress(buf.array(), lvl)
      case Some((id, lvl)) if id.startsWith("blosc") =>
        val parts = id.split(":") // "blosc:<cname>:<shuffle>"
        Blosc.compress(buf.array(), m.size,
          if (parts.length > 1) parts(1) else "lz4", lvl,
          if (parts.length > 2) parts(2).toInt else 1)
      case _ => buf.array()
    }
  }

  // ------------------------------------------------------------------
  // sharding_indexed codec (zarr v3 spec: one storage object = a grid of
  // independently-compressed inner chunks + a little-endian u64
  // (offset, nbytes) index, missing = (2^64-1, 2^64-1), optional crc32c
  // over the index bytes). The 100 TB lever: object count drops by the
  // inner-grid factor while reads keep inner-chunk granularity through
  // the index.
  // ------------------------------------------------------------------

  private def crc32c(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(b, off, len)
    c.getValue.toInt
  }

  /** Metadata for ONE inner chunk: shape = inner box, inner compressor,
    * shard=None (so the recursive encode/decode terminates). */
  private def innerMeta(m: ArrayMeta, sh: ShardSpec): ArrayMeta =
    ArrayMeta(sh.inner, sh.inner, m.order, m.kind, m.size, sh.innerComp,
      m.fillValue, m.separator, m.dims, Map.empty, v3 = true)

  /** Per-shard coordinate tables, computed ONCE (not per element — the
    * copy loops below run once per shard element and must stay primitive):
    * elemMap(f) = outer-box offset of inner element f relative to the
    * inner chunk's corner; baseOf(g) = outer-box offset of inner chunk
    * g's corner. */
  private def shardMaps(outer: Seq[Int], inner: Seq[Int],
                        innerGrid: Seq[Int]): (Array[Int], Array[Int]) = {
    val rank = outer.length
    val outStrides = outer.scanRight(1)(_ * _).tail.toArray
    val inStrides = inner.scanRight(1)(_ * _).tail.toArray
    val gridStrides = innerGrid.scanRight(1)(_ * _).tail.toArray
    val innerArr = inner.toArray
    val gridArr = innerGrid.toArray
    val nElem = inner.product
    val elemMap = new Array[Int](nElem)
    var f = 0
    while (f < nElem) {
      var pos = 0; var k = 0
      while (k < rank) {
        pos += ((f / inStrides(k)) % innerArr(k)) * outStrides(k); k += 1
      }
      elemMap(f) = pos; f += 1
    }
    val nGrid = innerGrid.product
    val baseOf = new Array[Int](nGrid)
    var g = 0
    while (g < nGrid) {
      var pos = 0; var k = 0
      while (k < rank) {
        pos += ((g / gridStrides(k)) % gridArr(k)) * innerArr(k) *
          outStrides(k)
        k += 1
      }
      baseOf(g) = pos; g += 1
    }
    (elemMap, baseOf)
  }

  private def decodeShard(raw: Array[Byte], m: ArrayMeta,
                          sh: ShardSpec): Array[Double] = {
    val innerGrid = m.chunks.zip(sh.inner).map { case (c, i) => c / i }
    val nInner = innerGrid.product
    val idxLen = nInner * 16 + (if (sh.indexCrc) 4 else 0)
    require(raw.length >= idxLen, "shard shorter than its index")
    val idxOff = if (sh.indexAtEnd) raw.length - idxLen else 0
    if (sh.indexCrc) {
      val want = ByteBuffer.wrap(raw, idxOff + nInner * 16, 4)
        .order(ByteOrder.LITTLE_ENDIAN).getInt
      require(crc32c(raw, idxOff, nInner * 16) == want,
        "shard index crc32c mismatch")
    }
    val ib = ByteBuffer.wrap(raw, idxOff, nInner * 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    val im = innerMeta(m, sh)
    val out = Array.fill(m.chunkElems)(m.fillValue)
    val (elemMap, baseOf) = shardMaps(m.chunks, sh.inner, innerGrid)
    var g = 0
    while (g < nInner) {
      val off = ib.getLong; val len = ib.getLong
      if (off != -1L || len != -1L) { // (2^64-1, 2^64-1) = missing chunk
        require(off >= 0 && len >= 0 && off + len <= raw.length,
          s"inner chunk $g range [$off, ${off + len}) outside shard")
        val slice = java.util.Arrays.copyOfRange(raw, off.toInt,
          (off + len).toInt)
        val vals = decodeChunk(slice, im)
        val base = baseOf(g)
        var f = 0
        while (f < vals.length) {
          out(base + elemMap(f)) = vals(f); f += 1
        }
      }
      g += 1
    }
    out
  }

  private def encodeShard(vals: Array[Double], m: ArrayMeta,
                          sh: ShardSpec): Array[Byte] = {
    val innerGrid = m.chunks.zip(sh.inner).map { case (c, i) => c / i }
    val nInner = innerGrid.product
    val im = innerMeta(m, sh)
    val (elemMap, baseOf) = shardMaps(m.chunks, sh.inner, innerGrid)
    val body = new ByteArrayOutputStream()
    val index = ByteBuffer.allocate(nInner * 16).order(ByteOrder.LITTLE_ENDIAN)
    val headerLen =
      if (!sh.indexAtEnd) nInner * 16 + (if (sh.indexCrc) 4 else 0) else 0
    var g = 0
    while (g < nInner) {
      val base = baseOf(g)
      val box = new Array[Double](sh.inner.product)
      var f = 0
      while (f < box.length) {
        box(f) = vals(base + elemMap(f)); f += 1
      }
      val enc = encodeChunk(box, im)
      index.putLong(headerLen + body.size()); index.putLong(enc.length.toLong)
      body.write(enc)
      g += 1
    }
    val idxBytes = index.array()
    val out = new ByteArrayOutputStream()
    def writeIndex(): Unit = {
      out.write(idxBytes)
      if (sh.indexCrc) {
        val c = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        c.putInt(crc32c(idxBytes, 0, idxBytes.length))
        out.write(c.array())
      }
    }
    if (!sh.indexAtEnd) { writeIndex(); out.write(body.toByteArray) }
    else { out.write(body.toByteArray); writeIndex() }
    out.toByteArray
  }

  /** Driver-side whole-array read (coordinate vectors — 1-D, small by the
    * xarray contract; data variables go through [[toLongDF]]). */
  def readArray(spark: SparkSession, store: String, name: String)
      : (ArrayMeta, Array[Double]) = {
    val m = openMetaAny(spark, store, name)
    val fs = fsFor(store, spark)
    val out = new Array[Double](m.shape.product)
    val grid = m.chunkGrid
    val gridIdx = grid.foldLeft(Seq(Seq.empty[Int])) { (acc, g) =>
      acc.flatMap(p => (0 until g).map(p :+ _))
    }
    val shapeStrides = m.shape.scanRight(1)(_ * _).tail
    val chunkStrides = m.chunks.scanRight(1)(_ * _).tail
    gridIdx.foreach { ci =>
      val p = new Path(store, s"$name/${m.chunkKey(ci)}")
      if (fs.exists(p)) {
        val vals = decodeChunk(readBytes(fs, p), m)
        vals.indices.foreach { flat =>
          val local = m.chunks.indices.map(k => (flat / chunkStrides(k)) % m.chunks(k))
          val global = local.zip(ci).zip(m.chunks).map { case ((l, c), w) => c * w + l }
          if (global.zip(m.shape).forall { case (g, s) => g < s })
            out(global.zip(shapeStrides).map { case (g, st) => g * st }.sum) = vals(flat)
        }
      } else {
        // absent chunk = all fill_value (zarr contract)
        val local = Array.fill(m.chunkElems)(m.fillValue)
        local.indices.foreach { flat =>
          val li = m.chunks.indices.map(k => (flat / chunkStrides(k)) % m.chunks(k))
          val global = li.zip(ci).zip(m.chunks).map { case ((l, c), w) => c * w + l }
          if (global.zip(m.shape).forall { case (g, s) => g < s })
            out(global.zip(shapeStrides).map { case (g, st) => g * st }.sum) = m.fillValue
        }
      }
    }
    (m, out)
  }

  // ------------------------------------------------------------------
  // distributed reader
  // ------------------------------------------------------------------

  /** Open one data variable of a zarr store as a long-format DataFrame:
    * one row per element, one column per dimension (the 1-D coordinate
    * array's values when present in the store, else the 0-based index)
    * plus the value column. Chunk decode runs in the executors (one task
    * per chunk file via the binaryFile source); only metadata and coord
    * vectors are read driver-side. */
  def toLongDF(spark: SparkSession, store: String, varName: String): DataFrame = {
    val m = openMetaAny(spark, store, varName)
    require(m.dims.length == m.shape.length,
      s"$varName lacks dimension names " +
        "(v2 _ARRAY_DIMENSIONS / v3 dimension_names)")

    val fs = fsFor(store, spark)
    // coordinate vectors (optional per dim)
    val coords: Seq[Option[(ArrayMeta, Array[Double])]] = m.dims.map { d =>
      if (fs.exists(new Path(store, s"$d/.zarray")) ||
          fs.exists(new Path(store, s"$d/zarr.json")))
        Some(readArray(spark, store, d)) else None
    }
    val fields = m.dims.zip(coords).map { case (d, cv) =>
      val integral = cv.forall(_._1.integral)
      StructField(d, if (integral) LongType else DoubleType)
    } :+ StructField(varName, if (m.integral) LongType else DoubleType)
    val schema = StructType(fields)

    val chunkFiles =
      if (m.separator == "/") {
        // nested chunk keys — v3's "c/i/j/..." and v2's NestedDirectoryStore
        // "i/j/..." — resolve with one glob of rank wildcards
        val base = if (m.v3) varName + "/c/" else varName + "/"
        val pat = new Path(store,
          base + Seq.fill(m.shape.length)("*").mkString("/"))
        val hits = fs.globStatus(pat)
        if (hits == null) Array.empty[Path]
        else hits.map(_.getPath).filter(p => !p.getName.startsWith("."))
      } else if (m.v3) // "." separator: flat "c.0.0" files in the array dir
        fs.listStatus(new Path(store, varName))
          .map(_.getPath).filter(_.getName.startsWith("c."))
      else
        fs.listStatus(new Path(store, varName))
          .map(_.getPath).filter(p => !p.getName.startsWith(".") &&
            p.getName != "zarr.json")
    if (chunkFiles.isEmpty) return spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)

    val metaB = spark.sparkContext.broadcast(m)
    val coordsB = spark.sparkContext.broadcast(coords.map(_.map(_._2)))
    val coordIntegral = coords.map(_.forall(_._1.integral))
    val binary = spark.read.format("binaryFile")
      .load(chunkFiles.map(_.toString): _*)
      .select(col("path"), col("content"))
    val rdd = binary.rdd.flatMap { row =>
      val mm = metaB.value
      val cs = coordsB.value
      val segs = row.getString(0).split('/')
      val ci =
        if (mm.separator == "/")
          segs.takeRight(mm.shape.length).map(_.toInt).toSeq
        else if (mm.v3) // "c.0.0" -> drop the "c" prefix segment
          segs.last.split(java.util.regex.Pattern.quote(mm.separator))
            .drop(1).map(_.toInt).toSeq
        else segs.last.split(java.util.regex.Pattern.quote(mm.separator))
          .map(_.toInt).toSeq
      val vals = decodeChunk(row.getAs[Array[Byte]](1), mm)
      val chunkStrides = mm.chunks.scanRight(1)(_ * _).tail
      vals.indices.iterator.flatMap { flat =>
        val global = mm.chunks.indices.map { k =>
          ci(k) * mm.chunks(k) + (flat / chunkStrides(k)) % mm.chunks(k)
        }
        if (global.zip(mm.shape).exists { case (g, s) => g >= s }) None // edge pad
        else {
          val coordVals: Seq[Any] = global.zipWithIndex.map { case (g, k) =>
            val raw = cs(k).map(_(g)).getOrElse(g.toDouble)
            if (coordIntegral(k)) raw.toLong else raw
          }
          val v: Any = if (mm.integral) vals(flat).toLong else vals(flat)
          Some(Row.fromSeq(coordVals :+ v))
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** List the store's array names (subdirectories with a `.zarray`). */
  def listArrays(spark: SparkSession, store: String): Seq[String] = {
    val fs = fsFor(store, spark)
    fs.listStatus(new Path(store)).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter { n =>
        val v3p = new Path(store, s"$n/zarr.json")
        fs.exists(new Path(store, s"$n/.zarray")) ||
          // a v3 zarr.json may also be a nested GROUP node — only arrays
          (fs.exists(v3p) &&
            (JsonMethods.parse(new String(readBytes(fs, v3p), "UTF-8"))
              \ "node_type") == JString("array"))
      }
      .sorted
  }

  /** `open_zarr` at dataset level (ref `backends/zarr.py:1222`): every
    * data variable of the store (arrays that are not 1-D coordinate
    * vectors named after their own dim) joined on the shared dimension
    * columns into ONE long-format DataFrame. v1 contract: all data vars
    * must share the same `_ARRAY_DIMENSIONS` tuple (the reference
    * broadcasts mismatched dims; out of scope here). Outer join, so a
    * var's missing chunks surface as NULLs rather than dropping cells. */
  /** The store's DATA variables (arrays that are not 1-D coord vectors
    * named after their own dim) with parsed metadata — the shared
    * classification for dataset- and tree-level opens. */
  def dataVarsOf(spark: SparkSession, store: String): Seq[(String, ArrayMeta)] = {
    val metas = listArrays(spark, store)
      .map(n => n -> openMetaAny(spark, store, n))
    val coordNames = metas.collect {
      case (n, m) if m.dims == Seq(n) => n
    }.toSet
    metas.filterNot { case (n, _) => coordNames(n) }
  }

  def openDataset(spark: SparkSession, store: String): DataFrame = {
    val dataVars = dataVarsOf(spark, store)
    require(dataVars.nonEmpty, s"no data variables in $store")
    val dims = dataVars.head._2.dims
    require(dataVars.forall(_._2.dims == dims),
      s"v1 open_zarr requires all data vars on the same dims; got " +
        dataVars.map { case (n, m) => s"$n:${m.dims.mkString("x")}" }.mkString(", "))
    dataVars.map { case (n, _) => toLongDF(spark, store, n) }
      .reduce(_.join(_, dims, "full_outer"))
  }

  /** `to_zarr(append_dim=...)` (ref `backends/zarr.py:846` region/append
    * dispatch, `dataset.py:2204`): extend one dimension with new labels
    * and write the new rows. The boundary chunk (where the old length is
    * not chunk-aligned) still holds live old cells, so its OLD rows are
    * captured first (lazily, with the pre-extension metadata — Spark's
    * shuffle boundary guarantees every chunk file is fully read before
    * any chunk file is rewritten) and unioned with the appended rows;
    * the chunk-grid region write then replaces exactly the boundary +
    * new chunks. Coord vector and `.zarray` shape are rewritten
    * driver-side. */
  def appendLongDF(df: DataFrame, store: String, varName: String,
                   appendDim: String, newLabels: Array[Double]): Unit = {
    val spark = df.sparkSession
    val m = openMetaAny(spark, store, varName)
    val axis = m.dims.indexOf(appendDim)
    require(axis >= 0, s"$appendDim not in ${m.dims}")
    val oldLen = m.shape(axis)
    val chunk = m.chunks(axis)
    // old coords per dim (appendDim's get extended)
    val coordMetas = m.dims.map(d => openMetaAny(spark, store, d))
    val oldCoords = m.dims.map(d => readArray(spark, store, d)._2)
    val dimValues = oldCoords.zipWithIndex.map { case (c, k) =>
      if (k == axis) c ++ newLabels else c
    }
    // boundary rows: old cells in the chunk the append starts inside,
    // captured with the OLD metadata (shape not yet extended)
    val boundaryStart = (oldLen / chunk) * chunk
    val boundary = if (oldLen % chunk == 0) None else {
      val bLabels: Seq[Any] = oldCoords(axis).slice(boundaryStart, oldLen)
        .toSeq.map(v =>
          if (coordMetas(axis).integral) (v.toLong: Any) else (v: Any))
      Some(toLongDF(spark, store, varName)
        .filter(col(appendDim).isin(bLabels: _*)))
    }
    // extend coord vector + shape (metadata only; chunk files untouched)
    val newAxisLen = oldLen + newLabels.length
    val cm = coordMetas(axis)
    writeArray(spark, store, appendDim,
      cm.copy(shape = Seq(newAxisLen), chunks = Seq(newAxisLen max 1)),
      dimValues(axis))
    // the rewritten coord is a single chunk — drop any stale chunk files
    // from a previous multi-chunk layout (v2: flat "0"; v3: under "c/")
    locally {
      val cfs = fsFor(store, spark)
      val keep0 = cm.copy(shape = Seq(newAxisLen),
        chunks = Seq(newAxisLen max 1)).chunkKey(Seq(0))
      val base = new Path(store, appendDim)
      val chunkDir = if (m.v3 && m.separator == "/") new Path(base, "c") else base
      if (cfs.exists(chunkDir))
        cfs.listStatus(chunkDir).filter(_.isFile).foreach { st =>
          val rel =
            if (chunkDir == base) st.getPath.getName
            else "c/" + st.getPath.getName
          val nm = st.getPath.getName
          if (!nm.startsWith(".") && nm != "zarr.json" && rel != keep0)
            cfs.delete(st.getPath, false)
        }
    }
    val fs = fsFor(store, spark)
    val m2 = m.copy(shape = m.shape.updated(axis, newAxisLen))
    writeArrayMeta(fs, store, varName, m2)
    // region write of boundary + appended rows against the NEW grid
    val rows = boundary.map(b =>
      df.select(b.columns.map(col): _*).unionByName(b)).getOrElse(df)
    writeLongDF(rows, store, varName, m.dims, dimValues, m.chunks,
      kind = m.kind, size = m.size, compressor = m.compressor,
      fillValue = m.fillValue, dimIntegral = cm.integral, region = true,
      zarrFormat = if (m.v3) 3 else 2, separator = Some(m.separator))
  }

  /** Consolidated metadata (`.zmetadata`, zarr v2 convention; the
    * reference writes it by default — `backends/zarr.py` consolidated):
    * every array's `.zarray`/`.zattrs` in one JSON document so a store
    * open is ONE metadata read instead of 2 per array — the point of the
    * convention at object-store scale. */
  def consolidate(spark: SparkSession, store: String): Unit = {
    val fs = fsFor(store, spark)
    require(!fs.exists(new Path(store, "zarr.json")),
      ".zmetadata consolidation is a zarr v2 convention; v3 stores have " +
        "no consolidated-metadata spec")
    val entries = scala.collection.mutable.ListBuffer.empty[(String, JValue)]
    entries += ".zgroup" -> JObject("zarr_format" -> JInt(2))
    listArrays(spark, store)
      .filter(n => fs.exists(new Path(store, s"$n/.zarray")))
      .foreach { n =>
      entries += s"$n/.zarray" -> JsonMethods.parse(new String(
        readBytes(fs, new Path(store, s"$n/.zarray")), "UTF-8"))
      val ap = new Path(store, s"$n/.zattrs")
      if (fs.exists(ap))
        entries += s"$n/.zattrs" -> JsonMethods.parse(new String(
          readBytes(fs, ap), "UTF-8"))
    }
    val doc = JObject(
      "zarr_consolidated_format" -> JInt(1),
      "metadata" -> JObject(entries.toList))
    writeBytes(fs, new Path(store, ".zmetadata"),
      JsonMethods.compact(JsonMethods.render(doc)).getBytes("UTF-8"))
  }

  /** The converter job: a zarr data variable -> partitioned parquet store. */
  def convert(spark: SparkSession, store: String, varName: String,
              outDir: String, chunkCols: Seq[String] = Nil): Unit =
    Store.write(toLongDF(spark, store, varName), outDir, chunkCols)

  // ------------------------------------------------------------------
  // writers
  // ------------------------------------------------------------------

  private def metaJson(m: ArrayMeta): String = {
    val comp = m.compressor match {
      case Some((id, lvl)) if id.startsWith("blosc") =>
        val parts = id.split(":")
        JObject("id" -> JString("blosc"),
          "cname" -> JString(if (parts.length > 1) parts(1) else "lz4"),
          "clevel" -> JInt(lvl),
          "shuffle" -> JInt(if (parts.length > 2) parts(2).toInt else 1),
          "blocksize" -> JInt(0))
      case Some((id, lvl)) =>
        JObject("id" -> JString(id), "level" -> JInt(lvl))
      case None => JNull
    }
    val dtypeStr = s"${if (m.size == 1) '|' else m.order}${m.kind}${m.size}"
    JsonMethods.compact(JsonMethods.render(JObject(
      "zarr_format" -> JInt(2),
      "shape" -> JArray(m.shape.map(i => JInt(BigInt(i))).toList),
      "chunks" -> JArray(m.chunks.map(i => JInt(BigInt(i))).toList),
      "dtype" -> JString(dtypeStr),
      "compressor" -> comp,
      "fill_value" -> (if (m.fillValue.isNaN && m.kind == 'f') JNull
                       else if (m.integral) JInt(BigInt(m.fillValue.toLong))
                       else JDouble(m.fillValue)),
      // a tperm equal to the dim reversal IS v2 F-order; any other
      // permutation has no v2 encoding (transpose is a v3 codec)
      "order" -> JString(m.tperm match {
        case None => "C"
        case Some(p) if p == m.chunks.indices.reverse => "F"
        case Some(p) => sys.error(
          s"v2 cannot encode transpose order $p (only C / F reversal)")
      }),
      "filters" -> JNull,
      "dimension_separator" -> JString(m.separator))))
  }

  private def attrsJson(m: ArrayMeta): String =
    JsonMethods.compact(JsonMethods.render(JObject(
      ("_ARRAY_DIMENSIONS" -> JArray(m.dims.map(JString(_)).toList)) ::
        m.attrs.toList.sortBy(_._1).map { case (k, v) => k -> JString(v) })))

  private def metaJsonV3(m: ArrayMeta): String = {
    val dtypeName = v3Dtypes.collectFirst {
      case (n, (k, s)) if k == m.kind && s == m.size => n
    }.getOrElse(sys.error(s"no v3 name for dtype ${m.kind}${m.size}"))
    def chainJson(order: Char, comp: Option[(String, Int)]): List[JObject] =
      JObject("name" -> JString("bytes"), "configuration" ->
        JObject("endian" -> JString(
          if (order == '>') "big" else "little"))) ::
      comp.toList.map { case (id, lvl) =>
        if (id.startsWith("blosc")) {
          val parts = id.split(":")
          JObject("name" -> JString("blosc"), "configuration" -> JObject(
            "cname" -> JString(if (parts.length > 1) parts(1) else "lz4"),
            "clevel" -> JInt(lvl),
            "shuffle" -> JString(
              if (parts.length > 2 && parts(2) == "0") "noshuffle"
              else "shuffle"),
            "typesize" -> JInt(m.size),
            "blocksize" -> JInt(0)))
        } else if (id == "zstd") {
          // zarr-python 3's default codec chain is bytes + zstd
          JObject("name" -> JString("zstd"), "configuration" -> JObject(
            "level" -> JInt(lvl), "checksum" -> JBool(false)))
        } else {
          require(id == "gzip", s"v3 writer supports gzip/blosc/zstd, got $id")
          JObject("name" -> JString("gzip"), "configuration" ->
            JObject("level" -> JInt(lvl)))
        }
      }
    // transpose is array->array: it precedes the bytes codec in the chain
    val tJson = m.tperm.toList.map { p =>
      JObject("name" -> JString("transpose"), "configuration" ->
        JObject("order" -> JArray(p.map(i => JInt(BigInt(i))).toList)))
    }
    val codecs = m.shard match {
      case Some(sh) =>
        require(m.tperm.isEmpty,
          "transpose inside sharding_indexed is not supported")
        List(JObject(
        "name" -> JString("sharding_indexed"),
        "configuration" -> JObject(
          "chunk_shape" -> JArray(sh.inner.map(i => JInt(BigInt(i))).toList),
          "codecs" -> JArray(chainJson(m.order, sh.innerComp)),
          "index_codecs" -> JArray(
            JObject("name" -> JString("bytes"), "configuration" ->
              JObject("endian" -> JString("little"))) ::
            (if (sh.indexCrc) List(JObject("name" -> JString("crc32c")))
             else Nil)),
          "index_location" -> JString(
            if (sh.indexAtEnd) "end" else "start"))))
      case None => tJson ::: chainJson(m.order, m.compressor)
    }
    JsonMethods.compact(JsonMethods.render(JObject(
      "zarr_format" -> JInt(3),
      "node_type" -> JString("array"),
      "shape" -> JArray(m.shape.map(i => JInt(BigInt(i))).toList),
      "data_type" -> JString(dtypeName),
      "chunk_grid" -> JObject("name" -> JString("regular"),
        "configuration" -> JObject("chunk_shape" ->
          JArray(m.chunks.map(i => JInt(BigInt(i))).toList))),
      "chunk_key_encoding" -> JObject("name" -> JString("default"),
        "configuration" -> JObject("separator" -> JString(m.separator))),
      "fill_value" -> (if (m.fillValue.isNaN && m.kind == 'f') JString("NaN")
                       else if (m.integral) JInt(BigInt(m.fillValue.toLong))
                       else JDouble(m.fillValue)),
      "codecs" -> JArray(codecs),
      "dimension_names" -> JArray(m.dims.map(JString(_)).toList),
      "attributes" -> JObject(
        m.attrs.toList.sortBy(_._1).map { case (k, v) => k -> JString(v) }))))
  }

  /** Write an array node's metadata in its format's layout. */
  private def writeArrayMeta(fs: FileSystem, store: String, name: String,
                             m: ArrayMeta): Unit =
    if (m.v3)
      writeBytes(fs, new Path(store, s"$name/zarr.json"),
        metaJsonV3(m).getBytes("UTF-8"))
    else {
      writeBytes(fs, new Path(store, s"$name/.zarray"),
        metaJson(m).getBytes("UTF-8"))
      writeBytes(fs, new Path(store, s"$name/.zattrs"),
        attrsJson(m).getBytes("UTF-8"))
    }

  /** Initialise a store directory (`.zgroup`). */
  def initStore(spark: SparkSession, store: String): Unit = {
    val fs = fsFor(store, spark)
    fs.mkdirs(new Path(store))
    writeBytes(fs, new Path(store, ".zgroup"),
      """{"zarr_format":2}""".getBytes("UTF-8"))
  }

  /** Initialise a v3 store (root `zarr.json` group node). */
  def initStoreV3(spark: SparkSession, store: String): Unit = {
    val fs = fsFor(store, spark)
    fs.mkdirs(new Path(store))
    writeBytes(fs, new Path(store, "zarr.json"),
      """{"zarr_format":3,"node_type":"group"}""".getBytes("UTF-8"))
  }

  /** Driver-side array write (coordinate vectors / small fixtures). */
  def writeArray(spark: SparkSession, store: String, name: String,
                 m: ArrayMeta, data: Array[Double]): Unit = {
    require(data.length == m.shape.product, "data length != shape product")
    val fs = fsFor(store, spark)
    fs.mkdirs(new Path(store, name))
    writeArrayMeta(fs, store, name, m)
    val grid = m.chunkGrid
    val gridIdx = grid.foldLeft(Seq(Seq.empty[Int])) { (acc, g) =>
      acc.flatMap(p => (0 until g).map(p :+ _))
    }
    val shapeStrides = m.shape.scanRight(1)(_ * _).tail
    val chunkStrides = m.chunks.scanRight(1)(_ * _).tail
    gridIdx.foreach { ci =>
      val vals = Array.fill(m.chunkElems)(m.fillValue)
      vals.indices.foreach { flat =>
        val local = m.chunks.indices.map(k => (flat / chunkStrides(k)) % m.chunks(k))
        val global = local.zip(ci).zip(m.chunks).map { case ((l, c), w) => c * w + l }
        if (global.zip(m.shape).forall { case (g, s) => g < s })
          vals(flat) = data(global.zip(shapeStrides).map { case (g, st) => g * st }.sum)
      }
      writeBytes(fs, new Path(store, s"$name/${m.chunkKey(ci)}"),
        encodeChunk(vals, m))
    }
  }

  /** Distributed `to_zarr` for a long-format DataFrame: rows are mapped
    * to (chunk id, local offset), shuffled ONCE by chunk id, and each
    * chunk box is materialised and encoded entirely inside an executor —
    * memory bounded by one chunk, one output file per chunk. Cells absent
    * from `df` get `fill_value`. Coordinate vectors (`dimValues`, the
    * sorted per-dim labels) are written driver-side as 1-D arrays.
    *
    * Region semantics (`to_zarr(region=...)` `backends/zarr.py:846`): with
    * `region=true` the store must already exist; metadata and coords are
    * left untouched and ONLY the chunks covered by `df` are replaced. */
  def writeLongDF(df: DataFrame, store: String, varName: String,
                  dims: Seq[String], dimValues: Seq[Array[Double]],
                  chunks: Seq[Int], kind: Char = 'f', size: Int = 8,
                  compressor: Option[(String, Int)] = Some(("zlib", 1)),
                  fillValue: Double = Double.NaN,
                  dimIntegral: Boolean = true,
                  region: Boolean = false,
                  zarrFormat: Int = 2,
                  writeCoords: Boolean = true,
                  separator: Option[String] = None,
                  shardInner: Option[Seq[Int]] = None,
                  transposeOrder: Option[Seq[Int]] = None): Unit = {
    val spark = df.sparkSession
    // Coord vectors are driver-held and broadcast — metadata-scale by
    // contract (mirrors NetCDF.writeDataset's maxCells). A billion-label
    // dim would OOM the driver; fail loudly with the knob to raise.
    val maxLabels = spark.conf.getOption("graft.zarr.maxCoordLabels")
      .map(_.toLong).getOrElse(50000000L)
    val nLabels = dimValues.map(_.length.toLong).sum
    require(nLabels <= maxLabels,
      s"$nLabels coordinate labels across ${dims.mkString(",")} exceed " +
        s"the driver-side cap $maxLabels (set graft.zarr.maxCoordLabels " +
        "to raise); dims this large need a chunked coord write path")
    val shape = dimValues.map(_.length)
    val isV3 = zarrFormat == 3
    // v2's default byte codec is raw zlib; v3's standard one is gzip
    val comp = compressor.map { case (id, lvl) =>
      if (isV3 && id == "zlib") ("gzip", lvl) else (id, lvl)
    }
    // A region write goes into an EXISTING store, so its physical layout
    // parameters must come from (or be validated against) the store's own
    // metadata — a mismatch writes blobs the store's readers misparse.
    val existing = if (region) Some(openMetaAny(spark, store, varName))
                   else None
    // chunk-key separator: an explicit caller choice wins; a region write
    // MUST honour the store's declared separator (a "."-separated v3
    // store written with "/" keys would leave readers looking at c.i.j
    // while we wrote c/i/j — silent stale data); otherwise the format
    // default ("/" nested for v3, "." flat for v2).
    val sep = separator
      .orElse(existing.map(_.separator))
      .getOrElse(if (isV3) "/" else ".")
    existing.foreach { e =>
      require(e.chunks == chunks,
        s"region write chunk shape $chunks != the store's ${e.chunks} — " +
          "the store's readers would misplace every cell")
    }
    // sharding (v3 only): `chunks` becomes the SHARD shape on disk; the
    // compressor moves inside the shard onto the inner chunks. A region
    // write into a SHARDED store inherits the store's shard spec even if
    // the caller didn't re-pass shardInner — writing plain chunk blobs at
    // shard keys would corrupt the store (the metadata still declares
    // sharding_indexed).
    val shardSpec = shardInner.map { inner =>
      require(isV3, "sharding requires zarrFormat = 3")
      require(inner.length == chunks.length &&
        inner.zip(chunks).forall { case (i, c) => i > 0 && c % i == 0 },
        s"inner chunk shape $inner must divide the shard shape $chunks")
      existing.foreach { e =>
        // The symmetric hazard to inheritance below: shard-encoding blobs
        // into a store whose metadata declares a plain codec chain would
        // silently corrupt it for readers.
        require(e.shard.isDefined,
          s"region write with inner chunk shape $inner targets a " +
            "NON-sharded store — its readers expect plain chunk blobs")
        e.shard.foreach { es =>
          require(es.inner == inner,
            s"region write inner chunk shape $inner != the store's ${es.inner}")
        }
      }
      ShardSpec(inner, comp)
    }.orElse(existing.flatMap(_.shard))
    // transpose (v3 array->array codec): a region write into a transposed
    // store INHERITS the store's permutation (plain-layout blobs at the
    // same keys would be misread), and an explicit mismatch fails loudly
    val tperm = transposeOrder.map { p =>
      require(isV3, "the transpose codec requires zarrFormat = 3")
      require(p.length == chunks.length &&
        p.sorted == chunks.indices.toList,
        s"transpose order $p is not a permutation of the " +
          s"${chunks.length} chunk dims")
      existing.foreach { e =>
        require(e.tperm.contains(p),
          s"region write transpose order $p != the store's ${e.tperm}")
      }
      p
    }.orElse(existing.flatMap(_.tperm))
    require(tperm.isEmpty || shardSpec.isEmpty,
      "transpose inside sharding_indexed is not supported")
    val m = ArrayMeta(shape, chunks, '<', kind, size,
      if (shardSpec.isDefined) None else comp, fillValue,
      sep, dims, Map.empty, v3 = isV3, shard = shardSpec, tperm = tperm)
    if (!region) {
      // writeCoords=false: an additional variable of an already-initialised
      // store — skip the store/coord rewrite, still write THIS var's meta
      if (writeCoords) {
        if (isV3) initStoreV3(spark, store) else initStore(spark, store)
        // coordinate vectors: driver-side 1-D arrays (metadata-scale)
        dims.zip(dimValues).foreach { case (d, vs) =>
          val cm = ArrayMeta(Seq(vs.length), Seq(vs.length max 1), '<',
            if (dimIntegral) 'i' else 'f', 8, None, 0.0, m.separator, Seq(d),
            Map.empty, v3 = isV3)
          writeArray(spark, store, d, cm, vs)
        }
      }
      val fs = fsFor(store, spark)
      fs.mkdirs(new Path(store, varName))
      writeArrayMeta(fs, store, varName, m)
    }
    // label -> index maps, broadcast (each is one dim's coord vector)
    val idxMaps: Seq[Map[Double, Int]] =
      dimValues.map(_.zipWithIndex.toMap)
    val mB = spark.sparkContext.broadcast(m)
    val idxB = spark.sparkContext.broadcast(idxMaps)
    val storeL = store; val varL = varName
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val chunkStrides = m.chunks.scanRight(1)(_ * _).tail
    val gridStrides = m.chunkGrid.scanRight(1)(_ * _).tail
    val cols = dims.map(col) :+ col(varName)
    val keyed = df.select(cols: _*).rdd.map { row =>
      val mm = mB.value; val maps = idxB.value
      val global = maps.indices.map { k =>
        val label = row.get(k) match {
          case l: Long => l.toDouble
          case i: Int => i.toDouble
          case d: Double => d
          case f: Float => f.toDouble
          case other => sys.error(s"non-numeric dim label $other")
        }
        maps(k).getOrElse(label, sys.error(s"label $label not in dim ${mm.dims(k)}"))
      }
      val chunkId = global.indices.map(k => (global(k) / mm.chunks(k)) * gridStrides(k)).sum
      val local = global.indices.map(k => (global(k) % mm.chunks(k)) * chunkStrides(k)).sum
      val v = row.get(maps.length) match {
        case d: Double => d; case f: Float => f.toDouble
        case l: Long => l.toDouble; case i: Int => i.toDouble
        case null => mm.fillValue
        case other => sys.error(s"non-numeric value $other")
      }
      (chunkId.toLong, local, v)
    }
    val nGrid = m.chunkGrid.product.toLong
    val parts = math.min(nGrid,
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toLong).toInt max 1
    // one shuffle, sorted by (chunk, offset) with chunk-only partitioning:
    // a partition streams its chunks contiguously, so only ONE chunk box
    // is ever materialised per task regardless of chunks-per-partition
    val chunkPartitioner = new org.apache.spark.Partitioner {
      def numPartitions: Int = parts
      def getPartition(key: Any): Int = {
        val c = key.asInstanceOf[(Long, Int)]._1
        ((c % parts) + parts).toInt % parts
      }
    }
    keyed.map { case (c, l, v) => ((c, l), v) }
      .repartitionAndSortWithinPartitions(chunkPartitioner)
      .mapPartitions { it =>
        val mm = mB.value
        val grid = mm.chunkGrid
        val gStrides = grid.scanRight(1)(_ * _).tail
        val fs = new Path(storeL).getFileSystem(conf.value)
        def flush(c: Long, vals: Array[Double]): Unit = {
          val ci = grid.indices.map(k => ((c / gStrides(k)) % grid(k)).toInt)
          val p = new Path(new Path(storeL, varL), mm.chunkKey(ci))
          val out = fs.create(p, true)
          try out.write(encodeChunk(vals, mm)) finally out.close()
        }
        var cur = -1L
        var box: Array[Double] = null
        var written = 0L
        it.foreach { case ((c, l), v) =>
          if (c != cur) {
            if (box != null) { flush(cur, box); written += 1 }
            cur = c; box = Array.fill(mm.chunkElems)(mm.fillValue)
          }
          box(l) = v
        }
        if (box != null) { flush(cur, box); written += 1 }
        Iterator.single(written)
      }.count() // materialise the writes
  }
}
