package graft.io

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** netCDF classic (CDF-1) reader/writer + the distributed .nc -> parquet
  * converter (the most common real-data entry point the engine was
  * missing; reference dispatch `xarray/backends/api.py:395`, scipy engine
  * `backends/scipy_.py`, netCDF4 engine `backends/netCDF4_.py:680`).
  *
  * Format (public netCDF classic spec): magic `CDF\x01`, big-endian
  * header — numrecs, dim_list, gatt_list, var_list (name, dimids,
  * vatt_list, nc_type, vsize, begin) — then 4-byte-aligned data
  * sections. Scope: fixed-size (non-record) variables of the six classic
  * types; attributes are parsed and skipped.
  *
  * 100 TB shape: .nc files are bounded self-describing binaries, so the
  * convert job reads a directory with Spark's `binaryFile` source (one
  * task per file, no driver bottleneck), decodes in the executors, and
  * writes a partitioned parquet store; only the SCHEMA comes from one
  * driver-side header parse. */
object NetCDF {

  val NC_BYTE = 1; val NC_CHAR = 2; val NC_SHORT = 3
  val NC_INT = 4; val NC_FLOAT = 5; val NC_DOUBLE = 6
  private val NC_DIMENSION = 10; private val NC_VARIABLE = 11
  private val NC_ATTRIBUTE = 12

  case class Dim(name: String, size: Int)
  /** Writer-side variable: values as doubles, encoded per `ncType`. */
  case class Var(name: String, dimIds: Seq[Int], ncType: Int, data: Array[Double])
  case class VarMeta(name: String, dimIds: Seq[Int], ncType: Int,
                     begin: Long, vsize: Int)
  case class Header(dims: Seq[Dim], vars: Seq[VarMeta])

  private def typeSize(t: Int): Int = t match {
    case NC_BYTE | NC_CHAR => 1
    case NC_SHORT => 2
    case NC_INT | NC_FLOAT => 4
    case NC_DOUBLE => 8
  }
  private def pad4(n: Int): Int = (4 - n % 4) % 4

  // ------------------------------------------------------------------
  // writer (fixtures + tooling)
  // ------------------------------------------------------------------

  def write(path: String, dims: Seq[Dim], vars: Seq[Var]): Unit = {
    val out = new ByteArrayOutputStream()
    def i32(v: Int): Unit = out.write(ByteBuffer.allocate(4).putInt(v).array())
    def name(s: String): Unit = {
      val b = s.getBytes("UTF-8")
      i32(b.length); out.write(b); out.write(new Array[Byte](pad4(b.length)))
    }
    def headerSize: Int = {
      def nameSz(s: String) = 4 + s.length + pad4(s.length)
      4 + 4 + // magic + numrecs
        8 + dims.map(d => nameSz(d.name) + 4).sum + // dim_list
        8 + // gatt ABSENT
        8 + vars.map(v => nameSz(v.name) + 4 + 4 * v.dimIds.length +
          8 + 4 + 4 + 4).sum // var entries (vatt ABSENT, type, vsize, begin)
    }
    def vsize(v: Var): Int = {
      val n = v.dimIds.map(dims(_).size).product * typeSize(v.ncType)
      n + pad4(n)
    }
    out.write(Array[Byte]('C', 'D', 'F', 1))
    i32(0) // numrecs
    i32(NC_DIMENSION); i32(dims.length)
    dims.foreach { d => name(d.name); i32(d.size) }
    i32(0); i32(0) // no global attributes
    i32(NC_VARIABLE); i32(vars.length)
    var begin = headerSize
    vars.foreach { v =>
      name(v.name); i32(v.dimIds.length); v.dimIds.foreach(i32)
      i32(0); i32(0) // no variable attributes
      i32(v.ncType); i32(vsize(v)); i32(begin)
      begin += vsize(v)
    }
    vars.foreach { v =>
      val buf = ByteBuffer.allocate(vsize(v))
      v.data.foreach { x =>
        v.ncType match {
          case NC_BYTE | NC_CHAR => buf.put(x.toByte)
          case NC_SHORT => buf.putShort(x.toShort)
          case NC_INT => buf.putInt(x.toInt)
          case NC_FLOAT => buf.putFloat(x.toFloat)
          case NC_DOUBLE => buf.putDouble(x)
        }
      }
      out.write(buf.array())
    }
    Files.write(Paths.get(path), out.toByteArray)
  }

  // ------------------------------------------------------------------
  // reader
  // ------------------------------------------------------------------

  def parseHeader(bytes: Array[Byte]): Header = {
    val buf = ByteBuffer.wrap(bytes)
    require(buf.get() == 'C' && buf.get() == 'D' && buf.get() == 'F',
      "not a netCDF classic file")
    val version = buf.get()
    require(version == 1 || version == 2, s"unsupported CDF version $version")
    def offset(): Long =
      if (version == 1) buf.getInt().toLong else buf.getLong()
    buf.getInt() // numrecs (record vars out of scope)
    def name(): String = {
      val len = buf.getInt()
      val b = new Array[Byte](len); buf.get(b)
      buf.position(buf.position() + pad4(len))
      new String(b, "UTF-8")
    }
    def skipAtts(): Unit = {
      val tag = buf.getInt(); val n = buf.getInt()
      require(tag == NC_ATTRIBUTE || (tag == 0 && n == 0), "bad att_list")
      (0 until n).foreach { _ =>
        name()
        val t = buf.getInt(); val nelems = buf.getInt()
        val sz = nelems * typeSize(t)
        buf.position(buf.position() + sz + pad4(sz))
      }
    }
    val dimTag = buf.getInt(); val ndims = buf.getInt()
    require(dimTag == NC_DIMENSION || (dimTag == 0 && ndims == 0), "bad dim_list")
    val dims = (0 until ndims).map(_ => Dim(name(), buf.getInt()))
    skipAtts() // global attributes
    val varTag = buf.getInt(); val nvars = buf.getInt()
    require(varTag == NC_VARIABLE || (varTag == 0 && nvars == 0), "bad var_list")
    val vars = (0 until nvars).map { _ =>
      val vn = name()
      val nd = buf.getInt()
      val dimIds = (0 until nd).map(_ => buf.getInt())
      skipAtts()
      val t = buf.getInt(); val vsize = buf.getInt(); val begin = offset()
      VarMeta(vn, dimIds, t, begin, vsize)
    }
    Header(dims, vars)
  }

  /** Decode one fixed-size variable's values as doubles, C (row-major)
    * order along its dims. */
  def readVar(bytes: Array[Byte], hdr: Header, varName: String): Array[Double] = {
    val v = hdr.vars.find(_.name == varName)
      .getOrElse(throw new NoSuchElementException(varName))
    val n = v.dimIds.map(hdr.dims(_).size).product
    val buf = ByteBuffer.wrap(bytes, v.begin.toInt, n * typeSize(v.ncType))
    Array.tabulate(n) { _ =>
      v.ncType match {
        case NC_BYTE | NC_CHAR => buf.get().toDouble
        case NC_SHORT => buf.getShort().toDouble
        case NC_INT => buf.getInt().toDouble
        case NC_FLOAT => buf.getFloat().toDouble
        case NC_DOUBLE => buf.getDouble()
      }
    }
  }

  private def isIntegral(t: Int): Boolean =
    t == NC_BYTE || t == NC_SHORT || t == NC_INT

  /** Open a directory of .nc files as ONE long-format DataFrame for a
    * data variable: one row per element, one column per dimension (the
    * 1-D coordinate variable's values when present, else the 0-based
    * index) plus the value column — `open_dataset(engine=
    * "netcdf-converted")`. Schema from one driver-side header parse;
    * decoding runs in the executors via the binaryFile source. */
  def toLongDF(spark: SparkSession, dir: String, varName: String): DataFrame = {
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".nc")).sortBy(_.getName)
    require(files.nonEmpty, s"no .nc files under $dir")
    val hdr = parseHeader(Files.readAllBytes(files.head.toPath))
    val v = hdr.vars.find(_.name == varName)
      .getOrElse(throw new NoSuchElementException(varName))
    val vdims = v.dimIds.map(hdr.dims(_))
    val coordVar = vdims.map(d => hdr.vars.find(w =>
      w.name == d.name && w.dimIds == Seq(hdr.dims.indexWhere(_.name == d.name))))
    val fields = vdims.zip(coordVar).map { case (d, cv) =>
      val integral = cv.forall(c => isIntegral(c.ncType)) // index coords -> long
      StructField(d.name, if (integral) LongType else DoubleType)
    } :+ StructField(varName, if (isIntegral(v.ncType)) LongType else DoubleType)
    val schema = StructType(fields)
    val varNameL = varName
    val binary = spark.read.format("binaryFile")
      .load(files.map(_.getAbsolutePath): _*)
      .select("content")
    val rdd = binary.rdd.flatMap { row =>
      val bytes = row.getAs[Array[Byte]](0)
      val h = parseHeader(bytes)
      val vv = h.vars.find(_.name == varNameL).get
      val ds = vv.dimIds.map(h.dims(_))
      val sizes = ds.map(_.size)
      val coords: Seq[Option[Array[Double]]] = ds.map { d =>
        h.vars.find(w => w.name == d.name &&
          w.dimIds == Seq(h.dims.indexWhere(_.name == d.name)))
          .map(_ => readVar(bytes, h, d.name))
      }
      val coordTypes = ds.map { d =>
        h.vars.find(_.name == d.name).map(_.ncType).getOrElse(NC_INT)
      }
      val data = readVar(bytes, h, varNameL)
      val strides = sizes.scanRight(1)(_ * _).tail
      data.indices.iterator.map { flat =>
        val idx = sizes.indices.map(k => (flat / strides(k)) % sizes(k))
        val coordVals: Seq[Any] = idx.zipWithIndex.map { case (i, k) =>
          val raw = coords(k).map(_(i)).getOrElse(i.toDouble)
          if (isIntegral(coordTypes(k))) raw.toLong else raw
        }
        val value: Any = if (isIntegral(vv.ncType)) data(flat).toLong else data(flat)
        Row.fromSeq(coordVals :+ value)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** The converter tool: every .nc under `inDir` decoded distributedly
    * and written as one parquet store for `varName`. */
  def convert(spark: SparkSession, inDir: String, varName: String,
              outDir: String, chunkCols: Seq[String] = Nil): Unit =
    Store.write(toLongDF(spark, inDir, varName), outDir, chunkCols)
}
