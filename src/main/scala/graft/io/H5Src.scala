package graft.io

import java.nio.{ByteBuffer, ByteOrder}

/** Random-access byte source for the HDF5 parser.
  *
  * The parser walks scattered small structures (superblock, object
  * headers, B-trees, heaps) that total kilobytes even in a multi-gigabyte
  * file. Abstracting the byte access lets the SAME parser run over
  *  - [[ArraySrc]]: a whole file in memory (tests, small files), and
  *  - [[PreadSrc]]: positional reads against the file with a small LRU
  *    page cache — the 100 TB path: the driver parses metadata touching
  *    only the pages the structures live on, and executors pread exactly
  *    the chunk byte-ranges they decode. No whole-file materialization
  *    anywhere.
  *
  * An implicit view from `Array[Byte]` keeps the historical
  * `parseFile(bytes)` / `readVar(bytes, ...)` call shape working.
  */
sealed trait H5Src {
  def length: Long
  /** `len` bytes at `pos` as a little-endian buffer. */
  def at(pos: Long, len: Int): ByteBuffer
  /** copy of `len` bytes at `pos` (chunk payloads, message bodies). */
  def slice(pos: Long, len: Int): Array[Byte]
  def byteAt(pos: Long): Byte
}

object H5Src {
  import scala.language.implicitConversions
  implicit def fromArray(a: Array[Byte]): H5Src = ArraySrc(a)

  /** Positional full read — the one pread idiom every reader shares. */
  def preadFully(ch: java.nio.channels.FileChannel, pos: Long,
                 len: Int, what: String): ByteBuffer = {
    require(len >= 0, s"negative read of $len bytes from $what")
    val b = ByteBuffer.allocate(len)
    var o = 0
    while (o < len) {
      val n = ch.read(b, pos + o)
      require(n > 0, s"short read at ${pos + o} of $what")
      o += n
    }
    b.flip(); b
  }
}

final case class ArraySrc(a: Array[Byte]) extends H5Src {
  def length: Long = a.length.toLong
  // bounds are REQUIREs, not array faults: a corrupted length field in
  // a parsed structure must raise a clear error, never a gigabyte
  // allocation attempt or a negative-size fault
  private def check(pos: Long, len: Int): Unit =
    require(pos >= 0 && len >= 0 && pos + len <= a.length,
      s"read [$pos, ${pos + len}) outside a ${a.length}-byte buffer")
  def at(pos: Long, len: Int): ByteBuffer = {
    check(pos, len)
    val b = ByteBuffer.wrap(a, pos.toInt, len)
    b.order(ByteOrder.LITTLE_ENDIAN); b
  }
  def slice(pos: Long, len: Int): Array[Byte] = {
    check(pos, len)
    java.util.Arrays.copyOfRange(a, pos.toInt, pos.toInt + len)
  }
  def byteAt(pos: Long): Byte = {
    check(pos, 1)
    a(pos.toInt)
  }
}

/** Positional-read source over a local or Hadoop-visible file with an
  * LRU page cache (default 64 pages x 64 KiB = 4 MiB resident). Reads
  * use FileChannel pread — thread-safe, no shared cursor. Not
  * serializable by design: ship the path and open per task. */
final class PreadSrc(path: String, pageSize: Int = 64 * 1024,
                     maxPages: Int = 64) extends H5Src with AutoCloseable {
  private val ch = java.nio.channels.FileChannel.open(
    java.nio.file.Paths.get(path), java.nio.file.StandardOpenOption.READ)
  val length: Long = ch.size()
  /** pages actually faulted in (monotonic; the scale tests assert the
    * metadata walk touches a small multiple of pageSize, not the file). */
  @volatile var pagesRead: Long = 0L
  private val cache = new java.util.LinkedHashMap[Long, Array[Byte]](
    maxPages, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[Long, Array[Byte]]): Boolean =
      size() > maxPages
  }
  private def page(idx: Long): Array[Byte] = cache.synchronized {
    val got = cache.get(idx)
    if (got != null) got
    else {
      val off = idx * pageSize
      val len = math.min(pageSize.toLong, length - off).toInt
      require(len > 0, s"read past EOF at page $idx of $path")
      val b = H5Src.preadFully(ch, off, len, path)
      pagesRead += 1
      cache.put(idx, b.array())
      b.array()
    }
  }
  def slice(pos: Long, len: Int): Array[Byte] = {
    require(pos >= 0 && len >= 0 && pos + len <= length,
      s"read [$pos, ${pos + len}) outside $path of $length bytes")
    val out = new Array[Byte](len)
    var done = 0
    while (done < len) {
      val p = pos + done
      val pg = page(p / pageSize)
      val po = (p % pageSize).toInt
      val n = math.min(len - done, pg.length - po)
      System.arraycopy(pg, po, out, done, n)
      done += n
    }
    out
  }
  def at(pos: Long, len: Int): ByteBuffer = {
    val b = ByteBuffer.wrap(slice(pos, len))
    b.order(ByteOrder.LITTLE_ENDIAN); b
  }
  def byteAt(pos: Long): Byte = {
    val pg = page(pos / pageSize)
    pg((pos % pageSize).toInt)
  }
  def close(): Unit = ch.close()
}
