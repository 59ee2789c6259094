package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Backend plugin registry — the reference's engine-dispatch entry point
  * (ref `xarray/backends/api.py:395` open_dataset engine= resolution;
  * `backends/plugins.py:93` ENTRYPOINTS registry).
  *
  * A backend maps (spark, path, options) to a DataFrame. Spark's own
  * DataSource V2 already IS a plugin registry for the heavy formats, so the
  * built-in engines simply delegate to `spark.read.format(...)`; the value
  * of this layer is (a) the same engine-keyed dispatch surface users of the
  * reference expect, and (b) a seam for formats Spark lacks (netCDF classic
  * via `io.NetCDF`). Registration is append-only and thread-safe; engines
  * registered later shadow earlier ones by name, mirroring the reference's
  * "last entry point wins" rule.
  */
object Backends {

  trait Backend {
    def read(spark: SparkSession, path: String,
             options: Map[String, String] = Map.empty): DataFrame
  }

  private final class SparkFormatBackend(fmt: String) extends Backend {
    def read(spark: SparkSession, path: String,
             options: Map[String, String]): DataFrame =
      spark.read.options(options).format(fmt).load(path)
  }

  /** netCDF classic (CDF-1): distributed .nc -> long-format read via
    * io.NetCDF. `options("var")` names the variable to extract. */
  private object NetCDFBackend extends Backend {
    def read(spark: SparkSession, path: String,
             options: Map[String, String]): DataFrame =
      NetCDF.toLongDF(spark, path, options.getOrElse("var", "data"))
  }

  @volatile private var registry: Map[String, Backend] = Map(
    "parquet" -> new SparkFormatBackend("parquet"),
    "orc" -> new SparkFormatBackend("orc"),
    "csv" -> new SparkFormatBackend("csv"),
    "json" -> new SparkFormatBackend("json"),
    "netcdf" -> NetCDFBackend)

  def register(engine: String, backend: Backend): Unit = synchronized {
    registry = registry + (engine -> backend)
  }

  def engines: Seq[String] = registry.keys.toSeq.sorted

  /** open_dataset(path, engine=...): engine dispatch; unknown engine lists
    * the known ones, like the reference's error message. */
  def openDataset(spark: SparkSession, path: String, engine: String,
                  options: Map[String, String] = Map.empty): DataFrame =
    registry.getOrElse(engine, throw new IllegalArgumentException(
      s"unrecognized engine '$engine'; registered: ${engines.mkString(", ")}"))
      .read(spark, path, options)
}
