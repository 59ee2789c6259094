package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{Backends, DictIO}
import graft.model.{XDataset, XIndex, XIndexes}

/** Plug-in surfaces: backend registry (open_dataset engine dispatch),
  * to_dict/from_dict roundtrip, set_xindex custom Index dispatch. */
class PluginSpec extends SparkSpec {
  import spark.implicits._

  test("backend registry dispatches by engine and rejects unknown ones") {
    val dir = java.nio.file.Files.createTempDirectory("graft_backend").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.mode("overwrite")
      .parquet(s"$dir/t.parquet")
    val df = Backends.openDataset(spark, s"$dir/t.parquet", "parquet")
    assert(df.count() === 2L)
    val e = intercept[IllegalArgumentException] {
      Backends.openDataset(spark, s"$dir/t.parquet", "hdf5")
    }
    assert(e.getMessage.contains("netcdf")) // lists registered engines
    // plug in a custom engine, last registration wins
    Backends.register("constant", new Backends.Backend {
      def read(s: SparkSession, path: String, o: Map[String, String]): DataFrame =
        s.range(3).toDF("k")
    })
    assert(Backends.openDataset(spark, "ignored", "constant").count() === 3L)
  }

  test("to_dict emits the reference structure and from_dict inverts it") {
    val ds = XDataset(
      Seq((1L, 10L, 1.5, "x"), (1L, 20L, 2.5, "y"),
          (2L, 10L, 3.5, "z"), (2L, 20L, 4.5, null: String))
        .toDF("t", "site", "v", "tag"),
      dims = Seq("t", "site"))
    val json = DictIO.toDict(ds)
    assert(json.contains("\"dims\":{\"t\":2,\"site\":2}"))
    assert(json.contains("\"data_vars\""))
    val back = DictIO.fromDict(spark, json)
    assert(back.meta.dims === Seq("t", "site"))
    val orig = ds.df.orderBy("t", "site").collect().map(_.toSeq).toSeq
    val rt = back.df.orderBy("t", "site").collect().map(_.toSeq).toSeq
    assert(rt === orig)
  }

  test("set_xindex dispatches sel through the attached index") {
    var calls = 0
    val counting = new XIndex {
      def sel(df: DataFrame, dim: String, values: Seq[Any]): DataFrame = {
        calls += 1; df.filter(col(dim).isin(values: _*))
      }
    }
    val ds = XDataset(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"),
      dims = Seq("k"))
    val plain = ds.sel("k", Seq(1L, 3L)).df.orderBy("k").collect()
    val viaIx = ds.setXIndex("k", counting).sel("k", Seq(1L, 3L))
      .df.orderBy("k").collect()
    assert(calls === 1)
    assert(viaIx.map(_.getString(1)).toSeq === plain.map(_.getString(1)).toSeq)
  }

  test("store dataset roundtrip keeps dims/coords/attrs via the sidecar") {
    import graft.io.{CFDecode, Store}
    val dir = java.nio.file.Files.createTempDirectory("graft_store_ds").toString
    val ds = new XDataset(
      Seq((1L, 100), (2L, -999), (3L, 104)).toDF("t", "enc"),
      graft.model.DatasetMeta(Seq("t"), coords = Set.empty,
        attrs = Map("title" -> "demo"),
        varAttrs = Map("enc" -> Map("_FillValue" -> "-999",
          "scale_factor" -> "0.5", "add_offset" -> "10"))))
    Store.writeDataset(ds, s"$dir/store")
    val back = Store.openDataset(spark, s"$dir/store")
    assert(back.meta.dims === Seq("t"))
    assert(back.meta.attrs === Map("title" -> "demo"))
    assert(back.meta.varAttrs("enc")("scale_factor") === "0.5")
    // decode_cf applies the coders the attrs declare: mask then scale
    val dec = CFDecode.decodeDataset(back)
    val vals = dec.df.orderBy("t").collect()
      .map(r => Option(r.get(1)).map(_.asInstanceOf[Double]))
    assert(vals.toSeq === Seq(Some(60.0), None, Some(62.0)))
  }

  test("range index layout preserves data and registry creates by name") {
    val ds = XDataset(spark.range(1000).toDF("k")
      .withColumn("v", col("k") * 2), dims = Seq("k"))
    val indexed = ds.setXIndex("k", "range")
    assert(indexed.df.count() === 1000L)
    assert(indexed.selSlice("k", 10, 19).df.count() === 10L)
    assert(XIndexes.names === Seq("hash", "range"))
    intercept[IllegalArgumentException] { XIndexes.create("btree") }
  }
}
