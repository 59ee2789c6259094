package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.llm.Multimodal

/** Real JVM-codec multimodal paths: PNG decode via javax.imageio,
  * nearest-neighbor resize, RIFF/WAVE PCM16 parse — plus the documented
  * stub fallback for unknown payloads. */
class MultimodalSpec extends SparkSpec {

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2),
      StructType(Seq(StructField("doc_id", LongType, nullable = false),
        StructField("media", BinaryType, nullable = false))))

  test("decode: real dimensions for PNG, stub for unknown payloads") {
    val df = mediaDf(Seq(
      1L -> png(12, 7, 0x336699),
      2L -> "not an image at all".getBytes("UTF-8")))
    val out = Multimodal.decode(df, "doc_id", "media")
      .orderBy("doc_id").collect()
    assert((out(0).getInt(2), out(0).getInt(3), out(0).getInt(4)) ===
      ((12, 7, 3)))
    // unknown payload -> deterministic stub dims
    val n = "not an image at all".getBytes("UTF-8").length
    assert((out(1).getInt(2), out(1).getInt(3)) === ((n % 640 + 1, (n * 7) % 480 + 1)))
  }

  test("imageFeatures: constant fill means are exact; non-images dropped") {
    val df = mediaDf(Seq(
      5L -> png(9, 4, (200 << 16) | (100 << 8) | 50),
      6L -> Array[Byte](1, 2, 3)))
    val out = Multimodal.imageFeatures(df, "doc_id", "media").collect()
    assert(out.length === 1)
    assert(out(0).getDouble(4) === 200.0)
    assert(out(0).getDouble(5) === 100.0)
    assert(out(0).getDouble(6) === 50.0)
  }

  test("resize re-encodes a decodable thumbnail at the target size") {
    val df = mediaDf(Seq(7L -> png(32, 16, 0xab1234)))
    val out = Multimodal.resize(df, "doc_id", "media", 8, 8).collect()
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0).getAs[Array[Byte]](1)))
    assert((img.getWidth, img.getHeight) === ((8, 8)))
    assert((img.getRGB(3, 3) & 0xffffff) === 0xab1234)
  }

  test("decodeWav parses PCM16 and computes exact rms for constant amp") {
    val n = 200; val v: Short = 16384 // rms = 0.5 exactly
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + n * 2); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(44100); bb.putInt(88200)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(n * 2)
    (0 until n).foreach(_ => bb.putShort(v))
    val df = mediaDf(Seq(9L -> bb.array(), 10L -> "nope".getBytes))
    val out = Multimodal.decodeWav(df, "doc_id", "media").collect()
    assert(out.length === 1)
    assert(out(0).getInt(1) === 44100)
    assert(out(0).getLong(4) === n.toLong)
    assert(out(0).getDouble(5) === 0.5)
  }

  test("animated GIF roundtrip: every frame enumerated with exact palette colors") {
    def solid(w: Int, h: Int, r: Int, g: Int, b: Int) = {
      val cm = new java.awt.image.IndexColorModel(8, 2,
        Array(r.toByte, 0.toByte), Array(g.toByte, 0.toByte),
        Array(b.toByte, 0.toByte))
      new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    }
    val gif3 = Multimodal.makeAnimatedGif(Seq(
      solid(5, 4, 200, 10, 30), solid(5, 4, 0, 255, 0),
      solid(5, 4, 12, 34, 56)))
    val gif1 = Multimodal.makeAnimatedGif(Seq(solid(3, 3, 7, 8, 9)))
    val df = mediaDf(Seq(1L -> gif3, 2L -> gif1, 3L -> "junk".getBytes))
    val out = Multimodal.gifFrames(df, "doc_id", "media")
      .orderBy("doc_id", "frame_no").collect()
    assert(out.length === 4, s"expected 3+1 frames, got ${out.length}")
    val f1 = out.filter(_.getLong(0) == 1L)
    assert(f1.map(_.getInt(1)).toSeq === Seq(0, 1, 2))
    assert(f1(0).getDouble(4) === 200.0 && f1(0).getDouble(5) === 10.0 &&
      f1(0).getDouble(6) === 30.0)
    assert(f1(1).getDouble(5) === 255.0)
    assert(f1(2).getDouble(4) === 12.0 && f1(2).getDouble(6) === 56.0)
    assert(out.filter(_.getLong(0) == 2L).length === 1)
  }

  test("truncated media at ANY cut point skips or parses — never throws") {
    // WAV: the valid PCM16 container from the decodeWav test
    val n = 64; val v: Short = 16384
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + n * 2); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(44100); bb.putInt(88200)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(n * 2)
    (0 until n).foreach(_ => bb.putShort(v))
    val wav = bb.array()
    val wavCuts = (0 until wav.length by 7).map(c =>
      c.toLong -> wav.take(c))
    // each row decodes to AT MOST one record; no exception anywhere
    assert(Multimodal.decodeWav(mediaDf(wavCuts), "doc_id", "media")
      .collect().length <= wavCuts.length)
    // PNG: a real encoded image truncated at every 13th byte
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val pngCuts = (0 until png.length by 13).map(c =>
      c.toLong -> png.take(c))
    assert(Multimodal.imageFeatures(mediaDf(pngCuts), "doc_id", "media")
      .collect().length <= pngCuts.length)
    // GIF frames: truncation must stop enumeration, not fail the job
    val gos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", gos)
    val gif = gos.toByteArray
    val gifCuts = (0 until gif.length by 11).map(c =>
      c.toLong -> gif.take(c))
    Multimodal.gifFrames(mediaDf(gifCuts), "doc_id", "media").collect()
  }

  test("wavFrameFeatures: exact per-frame mean-square and ZCR, trailing " +
    "partial frame dropped, non-WAV dropped") {
    val samples = Seq[Short](100, -100, 100, 0, -50, -50, 77) // 7 samples
    val bb = java.nio.ByteBuffer.allocate(44 + samples.size * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + samples.size * 2)
    bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(8000); bb.putInt(16000)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(samples.size * 2)
    samples.foreach(bb.putShort)
    val df = mediaDf(Seq(1L -> bb.array(), 2L -> "junk".getBytes))
    val out = Multimodal.wavFrameFeatures(df, "doc_id", "media", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // frame 0: [100,-100,100]: meansq = 30000/3 = 10000; zcr 2
    // frame 1: [0,-50,-50]: meansq = 5000/3 = 1666; 0*(-50) not < 0
    // sample 7 (77) is a trailing partial frame: dropped
    assert(out == Map(
      (1L, 0L) -> ((3L, 10000L, 2L)),
      (1L, 1L) -> ((3L, 1666L, 0L))))
  }
}
