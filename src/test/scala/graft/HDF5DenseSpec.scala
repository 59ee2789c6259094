package graft

import java.nio.file.{Files, Paths}
import graft.io.HDF5
import graft.io.HDF5.WVar

/** Dense (fractal-heap) group + attribute storage, byte-shuffle filter,
  * and compound datatypes — the netCDF-4 reader tail (HDF5 File Format
  * Specification v3: "Fractal Heap", "Version 2 B-trees", "Datatype
  * Message" class 6, filter id 2). The writer emits the same structures
  * (superblock v2, Link Info -> FRHP/FHDB/BTHD/BTLF, Attribute Info per
  * data var) so the roundtrip covers every new reader branch. */
class HDF5DenseSpec extends SparkSpec {

  private def denseFixture(path: String): Unit = {
    val time = Array.tabulate(6)(_.toDouble)
    val lat = Array.tabulate(5)(i => i * 0.5)
    val temp = (for (t <- 0 until 6; l <- 0 until 5)
      yield t * 100.0 + l * 1.5).toArray
    val press = (for (t <- 0 until 6; l <- 0 until 5)
      yield (t + l * 10).toFloat.toDouble).toArray
    HDF5.writeNc4(path,
      Seq("time" -> time, "lat" -> lat),
      Seq(
        // shuffle + deflate, with edge chunks on both axes
        WVar("temp", Seq(0, 1), temp, chunk = Some(Seq(4, 2)),
          shuffle = true),
        WVar("press", Seq(0, 1), press, f32 = true)),
      dense = true)
  }

  test("dense group: superblock v2 + fractal-heap links + name index") {
    val dir = Files.createTempDirectory("graft_h5d").toString
    val path = s"$dir/dense.nc4"
    denseFixture(path)
    val bytes = Files.readAllBytes(Paths.get(path))
    val f = HDF5.parseFile(bytes)
    assert(f.datasets.map(_.name).sorted ===
      Seq("lat", "press", "temp", "time"))
    assert(f.dims.toMap === Map("time" -> 6L, "lat" -> 5L))
    // DIMENSION_LIST arrives via DENSE attribute storage on data vars
    val temp = f.byName("temp")
    assert(f.varDims(temp) === Seq("time", "lat"))
    assert(temp.shuffleElem === Some(8))
    assert(temp.deflate)
  }

  test("shuffle+deflate chunks decode to the original values") {
    val dir = Files.createTempDirectory("graft_h5d2").toString
    val path = s"$dir/dense.nc4"
    denseFixture(path)
    val bytes = Files.readAllBytes(Paths.get(path))
    val f = HDF5.parseFile(bytes)
    assert(HDF5.readVar(bytes, f, "temp").toSeq ===
      (for (t <- 0 until 6; l <- 0 until 5) yield t * 100.0 + l * 1.5))
    assert(HDF5.readVar(bytes, f, "press").toSeq ===
      (for (t <- 0 until 6; l <- 0 until 5)
        yield (t + l * 10).toFloat.toDouble))
    assert(HDF5.readVar(bytes, f, "time").toSeq ===
      Seq(0.0, 1.0, 2.0, 3.0, 4.0, 5.0))
  }

  test("dense toLongDF matches the compact-group decode") {
    val dirD = Files.createTempDirectory("graft_h5d3").toString
    denseFixture(s"$dirD/part0.nc4")
    val df = HDF5.toLongDF(spark, dirD, "temp")
    assert(df.count() === 30)
    val row = df.filter(org.apache.spark.sql.functions.col("time") === 3L)
      .filter(org.apache.spark.sql.functions.col("lat") === 1.0)
      .head()
    assert(row.getDouble(2) === 303.0)
  }

  test("compound datatype: per-member extraction") {
    val dir = Files.createTempDirectory("graft_h5c").toString
    val path = s"$dir/compound.h5"
    val t = Array.tabulate(7)(_ * 10.0)
    val v = Array.tabulate(7)(i => i * 1.5 - 2.0)
    HDF5.writeCompoundFixture(path, "obs", Seq("t" -> t, "v" -> v))
    val bytes = Files.readAllBytes(Paths.get(path))
    val f = HDF5.parseFile(bytes)
    val obs = f.byName("obs")
    assert(obs.dtype.clazz === 6)
    assert(obs.dtype.members.map(_._1) === Seq("t", "v"))
    assert(HDF5.readVarMember(bytes, f, "obs", "t").toSeq === t.toSeq)
    assert(HDF5.readVarMember(bytes, f, "obs", "v").toSeq === v.toSeq)
    // whole-compound read is rejected with the member list
    val e = intercept[RuntimeException](HDF5.readVar(bytes, f, "obs"))
    assert(e.getMessage.contains("readVarMember"))
  }

  test("wide dense group: depth-1 name index (BTIN + leaves) roundtrips") {
    // 200 data vars + 1 dim > the ~185-record single-leaf capacity, so
    // the writer emits a BTIN root and the reader walks it
    val dir = Files.createTempDirectory("graft_h5w").toString
    val path = s"$dir/wide.nc4"
    val time = Array.tabulate(6)(_.toDouble)
    val vars = (0 until 200).map { i =>
      WVar(f"v$i%03d", Seq(0), Array.tabulate(6)(t => i * 1000.0 + t))
    }
    HDF5.writeNc4(path, Seq("time" -> time), vars, dense = true)
    val bytes = Files.readAllBytes(Paths.get(path))
    val f = HDF5.parseFile(bytes)
    assert(f.datasets.length === 201)
    assert(f.dims.toMap === Map("time" -> 6L))
    // spot-check vars from the first leaf, a separator record region,
    // and the last leaf
    Seq(0, 93, 187, 199).foreach { i =>
      val name = f"v$i%03d"
      assert(f.varDims(f.byName(name)) === Seq("time"))
      assert(HDF5.readVar(bytes, f, name).toSeq ===
        (0 until 6).map(t => i * 1000.0 + t))
    }
  }

  test("one corrupt object does not make the other variables unreadable") {
    val dir = Files.createTempDirectory("graft_h5x").toString
    val path = s"$dir/mixed.nc4"
    denseFixture(path)
    val bytes = Files.readAllBytes(Paths.get(path))
    val pressAddr = HDF5.parseFile(bytes).byName("press").addr
    bytes(pressAddr.toInt) = 99 // smash press's object-header version
    val f = HDF5.parseFile(bytes)
    // press carries its parse error; everything else still decodes
    val e = intercept[RuntimeException](HDF5.readVar(bytes, f, "press"))
    assert(e.getMessage.contains("failed metadata parse"))
    assert(HDF5.readVar(bytes, f, "temp").toSeq ===
      (for (t <- 0 until 6; l <- 0 until 5) yield t * 100.0 + l * 1.5))
  }

  test("nested indirect fractal-heap blocks resolve managed heap IDs") {
    import java.nio.{ByteBuffer, ByteOrder}
    // Hand-assembled heap per the spec's doubling table: start=512,
    // maxDirect=512, width=2 -> rows 0-1 direct, row 2+ indirect. Root
    // FHIB (3 rows) -> child FHIB covering [2048,3072) -> FHDB at heap
    // offset 2560. The object lives in that nested direct block.
    val bytes = new Array[Byte](1024 + 512)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def put(pos: Int)(f: ByteBuffer => Unit): Unit = { bb.position(pos); f(bb) }
    // FRHP at 0 (maxHeapBits 32 -> offSize 4; maxManaged 4096 -> lenSize 2)
    put(0) { b =>
      b.put("FRHP".getBytes).put(0.toByte)
      b.putShort(7)           // heap id length
      b.putShort(0)           // io filter length (unfiltered)
      b.put(0.toByte)         // flags: no checksums
      b.putInt(4096)          // max managed object size
      (0 until 12).foreach(_ => b.putLong(0L)) // huge/free/managed/tiny stats
      b.putShort(2)           // table width
      b.putLong(512L)         // starting block size
      b.putLong(512L)         // max direct block size
      b.putShort(32)          // max heap size (bits)
      b.putShort(1)           // starting rows
      b.putLong(160L)         // root block address
      b.putShort(3)           // current rows (root is INDIRECT, 3 rows)
    }
    // root FHIB at 160: block offset 0; rows 0-1 direct (all absent),
    // row 2 = two 1024-byte spans -> entry 0 is the child FHIB
    put(160) { b =>
      b.put("FHIB".getBytes).put(0.toByte)
      b.putLong(0L)                        // heap header address
      b.putInt(0)                          // block offset (offSize = 4)
      Seq(-1L, -1L, -1L, -1L, 240L, -1L).foreach(b.putLong)
    }
    // child FHIB at 240: covers heap [2048, 3072); nrows(1024) = 1;
    // its row 0 holds two 512-byte direct blocks, only the second present
    put(240) { b =>
      b.put("FHIB".getBytes).put(0.toByte)
      b.putLong(0L)
      b.putInt(2048)
      Seq(-1L, 320L).foreach(b.putLong)
    }
    // FHDB at 320: the direct block covering heap [2560, 3072)
    put(320) { b =>
      b.put("FHDB".getBytes).put(0.toByte)
      b.putLong(0L)
      b.putInt(2560)
    }
    val payload = "nested!".getBytes
    put(320 + 100)(_.put(payload)) // heap offset 2560 + 100 = 2660
    val fh = HDF5.parseFRHP(bytes, 0L)
    assert(fh.tableWidth === 2 && fh.curRows === 3 && fh.offSize === 4)
    // the walk must surface all three present direct blocks... here just
    // the nested one, at its true heap offset
    assert(HDF5.directBlocks(bytes, fh) === Seq((2560L, 512L, 320L)))
    val heapId = Array[Byte](0,
      (2660 & 0xff).toByte, ((2660 >> 8) & 0xff).toByte, 0, 0, // offset LE32
      payload.length.toByte, 0)                                // length LE16
    assert(new String(HDF5.fheapObject(bytes, fh, heapId)) === "nested!")
  }

  test("lookup3 matches the published test vectors") {
    // Bob Jenkins' lookup3.c self-test values for hashlittle(...)
    assert(HDF5.lookup3("".getBytes("UTF-8"), 0) === 0xdeadbeef)
    assert(HDF5.lookup3("Four score and seven years ago".getBytes("UTF-8"),
      0) === 0x17770551)
    assert(HDF5.lookup3("Four score and seven years ago".getBytes("UTF-8"),
      1) === 0xcd628161)
  }
}
