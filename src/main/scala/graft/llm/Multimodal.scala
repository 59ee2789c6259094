package graft.llm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in batches (the Scala analog
  * of `mapInPandas`).
  *
  * The decode step is REAL for the formats the JVM ships codecs for:
  * PNG/JPEG/BMP/GIF via `javax.imageio` (JDK java.desktop, headless-safe)
  * and WAV/PCM via a RIFF parse — no external libraries. Payloads in any
  * other format fall back to a deterministic stub (documented; a
  * production build swaps in a JNI codec without touching the plan). All
  * decoding runs inside `mapPartitions`, so the executor JVM decodes its
  * whole partition batch with no per-row driver round trips.
  */
object Multimodal {

  /** Output schema of the decode stage. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  /** Stub decode for payloads with no JVM codec: derives fake dimensions
    * from the byte payload deterministically (kept for plumbing tests and
    * as the documented unknown-format fallback). */
  private def fakeDecode(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    (n % 640 + 1, (n * 7) % 480 + 1, 3)
  }

  /** Magic-byte sniff: does this payload CLAIM to be a decodable image? */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte) || // JPEG
      (b(0) == 'B' && b(1) == 'M') ||                 // BMP
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F'))    // GIF

  /** Real image decode via the JDK codec; None when the payload doesn't
    * parse. ImageIO signals corrupt-after-the-magic payloads BOTH ways —
    * null for unrecognized streams and IIOException for damaged ones —
    * and a bad row must never fail the partition, so both become None. */
  private def imageDecode(bytes: Array[Byte])
      : Option[java.awt.image.BufferedImage] =
    if (!looksLikeImage(bytes)) None
    else try Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException | _: RuntimeException => None }

  /** Decode a binary media column per partition (batched, no per-row JVM
    * boundary crossings; the partition is the batch). Image payloads get
    * their REAL dimensions/band count; anything else the stub. */
  def decode(df: DataFrame, id: String, media: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(id), col(media)).rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, c) = imageDecode(bytes) match {
          case Some(img) =>
            (img.getWidth, img.getHeight, img.getRaster.getNumBands)
          case None => fakeDecode(bytes)
        }
        Row(r.getLong(0), bytes.length, w, h, c)
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  /** Image feature extraction (real decode): dimensions + per-channel
    * mean intensity. Rows whose payload is not a decodable image are
    * dropped — the curation-filter contract. */
  def imageFeatures(df: DataFrame, id: String, media: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(id), col(media)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        imageDecode(r.getAs[Array[Byte]](1)).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff
              sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          Row(r.getLong(0), w, h, img.getRaster.getNumBands,
            sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
        }
      }
    }
    spark.createDataFrame(rdd, imageFeatureSchema)
  }

  /** Encode `frames` as one ANIMATED GIF (the multi-frame container the
    * JDK can both write and read headlessly — the honest video stand-in:
    * real frame enumeration, decode, and per-frame features with zero
    * native codec dependencies). */
  def makeAnimatedGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  val frameFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false)))

  /** REAL multi-frame decode: enumerate every frame of an animated GIF
    * (ImageReader.getNumImages + per-frame read) and emit per-frame RGB
    * means — one row per (doc, frame). Executor-side; undecodable rows
    * are skipped (same contract as [[imageFeatures]]). */
  def gifFrames(df: DataFrame, id: String, media: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(id), col(media)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); Iterator.empty }
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = try reader.getNumImages(true) catch { case _: Throwable => 0 }
            // A corrupt/truncated frame stops enumeration at that frame
            // rather than failing the job (skip contract, as documented).
            val rows = Vector.newBuilder[Row]
            var f = 0
            var ok = true
            while (f < n && ok) {
              try {
                val img = reader.read(f)
                val (w, h) = (img.getWidth, img.getHeight)
                var sr = 0L; var sg = 0L; var sb = 0L
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val rgb = img.getRGB(x, y)
                    sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff
                    sb += rgb & 0xff
                    x += 1
                  }
                  y += 1
                }
                val cnt = w.toLong * h
                rows += Row(r.getLong(0), f, w, h,
                  sr.toDouble / cnt, sg.toDouble / cnt, sb.toDouble / cnt)
              } catch { case _: Exception => ok = false }
              f += 1
            }
            rows.result().iterator
          } finally {
            reader.dispose(); iis.close()
          }
        }
      }
    }
    spark.createDataFrame(rdd, frameFeatureSchema)
  }

  /** Nearest-neighbor thumbnail resize (real decode): re-encodes each
    * image as a `tw`x`th` PNG. Executor-side, batch = partition. */
  def resize(df: DataFrame, id: String, media: String,
             tw: Int, th: Int): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("thumb", BinaryType, nullable = false)))
    val rdd = df.select(col(id), col(media)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        imageDecode(r.getAs[Array[Byte]](1)).map { img =>
          val out = new java.awt.image.BufferedImage(tw, th,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < th) {
            var x = 0
            while (x < tw) {
              out.setRGB(x, y, img.getRGB(
                x * img.getWidth / tw, y * img.getHeight / th))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Row(r.getLong(0), bos.toByteArray)
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  val wavSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("rms", DoubleType, nullable = false)))

  /** Parse a RIFF/WAVE header + 16-bit PCM data chunk: (sampleRate,
    * channels, bits, nFrames, rms of normalized samples). */
  private def wavDecode(bytes: Array[Byte])
      : Option[(Int, Int, Int, Long, Double)] = {
    if (bytes.length < 44 || bytes(0) != 'R' || bytes(1) != 'I' ||
      bytes(2) != 'F' || bytes(3) != 'F' || bytes(8) != 'W' ||
      bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E') return None
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var p = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var out: Option[(Int, Int, Int, Long, Double)] = None
    while (p + 8 <= bytes.length && out.isEmpty) {
      val cid = new String(bytes, p, 4, "US-ASCII")
      val sz = b.getInt(p + 4)
      // a corrupt size field must DROP the row, not hang the scan (sz < 0
      // would stall the cursor) or overrun the array (truncated payloads)
      if (sz < 0 || p + 8 + sz > bytes.length) return None
      cid match {
        case "fmt " =>
          if (sz < 16) return None
          fmt = Some((b.getShort(p + 10).toInt, b.getInt(p + 12),
            b.getShort(p + 22).toInt))
        case "data" =>
          val (ch, rate, bits) = fmt.getOrElse(return None)
          if (bits != 16) return None // PCM16 is the supported subset
          val nSamp = sz / 2
          var ss = 0.0
          var i = 0
          while (i < nSamp) {
            val v = b.getShort(p + 8 + i * 2) / 32768.0
            ss += v * v
            i += 1
          }
          out = Some((rate, ch, bits, nSamp.toLong / math.max(ch, 1),
            math.sqrt(ss / math.max(nSamp, 1))))
        case _ => ()
      }
      p += 8 + sz + (sz & 1)
    }
    out
  }

  /** Real audio decode: RIFF/WAVE PCM16 header + sample statistics.
    * Non-WAV payloads are dropped. */
  def decodeWav(df: DataFrame, id: String, media: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(id), col(media)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        wavDecode(r.getAs[Array[Byte]](1)).map { case (sr, ch, bits, n, rms) =>
          Row(r.getLong(0), sr, ch, bits, n, rms)
        }
      }
    }
    spark.createDataFrame(rdd, wavSchema)
  }

  /** Audio frame features over decoded PCM16: per non-overlapping
    * `frameLen`-sample frame, the MEAN SQUARE energy (Σ s² div n —
    * exact integer on the raw sample grid; rms = sqrt(meansq)/32768
    * whenever a float view is wanted) and the zero-crossing rate
    * (adjacent sign products < 0) — the two classic VAD/segmentation
    * features. Trailing partial frames are dropped (fixed batch shape).
    * Executor-side decode, one row per frame — the q190/q191 decode
    * contract extended to real per-frame DSP. */
  def wavFrameFeatures(df: DataFrame, id: String, media: String,
                       frameLen: Int): DataFrame = {
    require(frameLen > 0, s"frameLen must be positive: $frameLen")
    val spark = df.sparkSession
    val rdd = df.select(col(id), col(media)).rdd.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val docId = r.getLong(0)
        samplesPcm16(bytes) match {
          case None => Iterator.empty
          case Some(samples) =>
            val nFrames = samples.length / frameLen
            (0 until nFrames).iterator.map { f =>
              var ss = 0L
              var zc = 0L
              var j = f * frameLen
              val end = j + frameLen
              while (j < end) {
                val s = samples(j).toLong
                ss += s * s
                if (j + 1 < end &&
                  samples(j).toLong * samples(j + 1) < 0) zc += 1
                j += 1
              }
              Row(docId, f.toLong, frameLen.toLong, ss / frameLen, zc)
            }
        }
      }
    }
    spark.createDataFrame(rdd, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("frame_no",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("meansq",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("zcr",
        org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** PCM16 sample extraction from a RIFF/WAVE payload (mono stream
    * view: channels interleave untouched); None on non-WAV. */
  private def samplesPcm16(bytes: Array[Byte]): Option[Array[Short]] = {
    if (bytes.length < 44 || bytes(0) != 'R' || bytes(1) != 'I' ||
      bytes(2) != 'F' || bytes(3) != 'F' || bytes(8) != 'W' ||
      bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E') return None
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var p = 12
    var bits = -1
    while (p + 8 <= bytes.length) {
      val cid = new String(bytes, p, 4, "US-ASCII")
      val sz = b.getInt(p + 4)
      if (sz < 0 || p + 8 + sz > bytes.length) return None
      cid match {
        case "fmt " =>
          if (sz < 16) return None
          bits = b.getShort(p + 22).toInt
        case "data" =>
          if (bits != 16) return None
          val n = sz / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = b.getShort(p + 8 + i * 2); i += 1 }
          return Some(out)
        case _ => ()
      }
      p += 8 + sz + (sz & 1)
    }
    None
  }

  /** Frame sampling: emit every `stride`-th fixed-size chunk of the
    * payload as a "frame" — the raw-stream (e.g. RGB24 video) chunking
    * contract; schema/partitioning identical to container-aware
    * extraction. */
  def frameSample(df: DataFrame, id: String, media: String,
                  frameBytes: Int, stride: Int): DataFrame =
    df.select(col(id), posexplode(split_binaryChunks(col(media), frameBytes))
      .as(Seq("frame_no", "frame")))
      .filter(col("frame_no") % stride === 0)

  /** Chunk a binary column into fixed-size pieces (expression-only). */
  private def split_binaryChunks(media: org.apache.spark.sql.Column, n: Int) =
    transform(
      sequence(lit(0), greatest(((length(media) - 1) / n).cast("int"), lit(0))),
      i => substring(media, (i * n + 1).cast("int"), lit(n)))
}
