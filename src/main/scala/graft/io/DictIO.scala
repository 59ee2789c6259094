package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.model.{DatasetMeta, XDataset}

/** to_dict / from_dict — the reference's plain-python export
  * (ref `xarray/core/dataset.py:7099` to_dict, `:7135` from_dict).
  *
  * Like the reference, this is an interchange format for SMALL datasets
  * (configs, fixtures, test payloads): to_dict collects to the driver and
  * refuses above `limit` rows — big data belongs in parquet/zarr, not JSON.
  * Data arrays are row-major over the dataset's dim order, so a dense
  * dataset round-trips exactly; json4s (already on Spark's classpath) does
  * the serialization.
  */
object DictIO {

  private def toJValue(v: Any): JValue = v match {
    case null                 => JNull
    case b: Boolean           => JBool(b)
    case i: Int               => JInt(BigInt(i))
    case l: Long              => JInt(BigInt(l))
    case d: Double            => JDouble(d)
    case f: Float             => JDouble(f.toDouble)
    case d: java.math.BigDecimal => JDecimal(BigDecimal(d))
    case t: java.sql.Timestamp => JString(t.toInstant.toString)
    case d: java.sql.Date     => JString(d.toString)
    case s: String            => JString(s)
    case other                => JString(other.toString)
  }

  /** Export an XDataset as the reference's to_dict JSON:
    * `{dims: {d: n}, coords: {d: {dims: [d], data: [...]}},
    *   data_vars: {v: {dims: [...], data: [...]}}, attrs: {...}}`. */
  def toDict(ds: XDataset, limit: Int = 100000): String = {
    val dims = ds.meta.dims
    val rows = ds.df.orderBy(dims.map(col): _*).limit(limit + 1).collect()
    require(rows.length <= limit,
      s"to_dict is for small datasets; got > $limit rows — write parquet instead")
    val dimVals: Seq[(String, Seq[Any])] = dims.map { d =>
      d -> rows.map(_.getAs[Any](d)).distinct.toSeq
    }
    // The dict format is dense-cartesian: dims sizes must multiply out to
    // the row count, else the emitted dims/data lengths disagree and the
    // JSON is silently corrupt for any consumer that trusts `dims`.
    require(dims.isEmpty ||
        rows.length.toLong == dimVals.map(_._2.size.toLong).product,
      s"to_dict requires a dense dataset: ${rows.length} rows != product of " +
        s"dim sizes ${dimVals.map { case (d, vs) => s"$d=${vs.size}" }.mkString("×")}")
    val vars = ds.dataVars
    val json = JObject(
      "dims" -> JObject(dimVals.map { case (d, vs) => d -> JInt(vs.size) }.toList),
      "coords" -> JObject(dimVals.map { case (d, vs) =>
        d -> JObject("dims" -> JArray(List(JString(d))),
          "data" -> JArray(vs.map(toJValue).toList))
      }.toList),
      "data_vars" -> JObject(vars.map { v =>
        v -> JObject("dims" -> JArray(dims.map(JString(_)).toList),
          "data" -> JArray(rows.map(r => toJValue(r.getAs[Any](v))).toList))
      }.toList),
      "attrs" -> JObject(ds.meta.attrs.toList.sortBy(_._1)
        .map { case (k, v) => k -> JString(v) }))
    JsonMethods.compact(JsonMethods.render(json))
  }

  private def fromJValue(v: JValue): Any = v match {
    case JNull       => null
    case JBool(b)    => b
    case JInt(i)     => i.toLong
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case JString(s)  => s
    case other       => other.toString
  }

  private def sparkType(values: Seq[Any]): DataType =
    values.find(_ != null) match {
      case Some(_: Boolean) => BooleanType
      case Some(_: Long)    => LongType
      case Some(_: Double)  => DoubleType
      case _                => StringType
    }

  /** Rebuild an XDataset from to_dict JSON. Every data_var must span the
    * full dim set in dataset order (the dense row-major layout to_dict
    * emits). */
  def fromDict(spark: SparkSession, json: String): XDataset = {
    val root = JsonMethods.parse(json)
    val dims = (root \ "dims").asInstanceOf[JObject].obj.map(_._1)
    val coords: Seq[(String, Seq[Any])] = dims.map { d =>
      d -> (root \ "coords" \ d \ "data").asInstanceOf[JArray].arr.map(fromJValue)
    }
    val sizes = coords.map(_._2.size)
    val total = sizes.product
    val varsJ = (root \ "data_vars").asInstanceOf[JObject].obj
    val varData: Seq[(String, Seq[Any])] = varsJ.map { case (name, body) =>
      val vdims = (body \ "dims").asInstanceOf[JArray].arr.collect { case JString(s) => s }
      require(vdims == dims, s"from_dict: var $name dims $vdims != dataset dims $dims")
      val data = (body \ "data").asInstanceOf[JArray].arr.map(fromJValue)
      require(data.size == total, s"from_dict: var $name has ${data.size} values, expected $total")
      name -> data
    }
    // row-major unravel: last dim varies fastest
    val rows = (0 until total).map { i =>
      var rem = i
      val idx = sizes.reverse.map { n => val j = rem % n; rem /= n; j }.reverse
      Row.fromSeq(coords.zip(idx).map { case ((_, vs), j) => vs(j) } ++
        varData.map(_._2(i)))
    }
    val schema = StructType(
      coords.map { case (d, vs) => StructField(d, sparkType(vs)) } ++
        varData.map { case (v, vs) => StructField(v, sparkType(vs)) })
    val attrs = (root \ "attrs") match {
      case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty[String, String]
    }
    new XDataset(
      spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), schema),
      DatasetMeta(dims = dims, attrs = attrs))
  }
}
