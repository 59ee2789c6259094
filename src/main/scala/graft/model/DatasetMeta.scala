package graft.model

/** Metadata catalog for the long-format (exploded) encoding of a labeled
  * N-dimensional dataset (SURVEY.md §1.5).
  *
  * In the reference (pydata/xarray, `xarray/core/dataset.py:202`) a Dataset is
  * a dict of named Variables sharing a dimension namespace plus coordinate
  * variables and attrs. Here the data lives in ONE Spark DataFrame whose key
  * columns are the dimension coordinates and whose remaining columns are data
  * variables; everything xarray keeps as Python-side structure (dim ORDER,
  * which columns are coordinates, attrs) lives in this catalog so that
  * transpose / rename / set_coords stay O(1) metadata edits and never touch
  * data (SURVEY.md §7.4 item 8).
  *
  * @param dims   ordered dimension names (xarray dim order; Spark columns are
  *               unordered so the order lives here — ref `dataset.py:481`)
  * @param coords names of non-dimension coordinate columns (ref
  *               `_coord_names`, `dataset.py:202`)
  * @param attrs  free-form metadata, analog of `Dataset.attrs`
  */
final case class DatasetMeta(
    dims: Seq[String],
    coords: Set[String] = Set.empty,
    attrs: Map[String, String] = Map.empty,
    varAttrs: Map[String, Map[String, String]] = Map.empty) {

  def keyCols: Seq[String] = dims ++ coords.toSeq.sorted

  def withDims(newDims: Seq[String]): DatasetMeta = copy(dims = newDims)

  /** transpose is metadata-only: reorder `dims` (ref `dataset.py:6299`). */
  def transpose(order: String*): DatasetMeta = {
    require(order.toSet == dims.toSet, s"transpose($order) != dims $dims")
    copy(dims = order)
  }

  def rename(mapping: Map[String, String]): DatasetMeta = copy(
    dims = dims.map(d => mapping.getOrElse(d, d)),
    coords = coords.map(c => mapping.getOrElse(c, c)),
    varAttrs = varAttrs.map { case (k, v) => mapping.getOrElse(k, k) -> v })
}

object DatasetMeta {

  /** combine_attrs policies for merge/concat/combine (ref
    * `core/merge.py:622` merge_attrs; the five modes of the reference).
    * Pure metadata — applied on the driver when datasets combine. */
  def combineAttrs(mode: String,
                   attrsList: Seq[Map[String, String]]): Map[String, String] =
    mode match {
      case "drop" => Map.empty
      case "override" => attrsList.headOption.getOrElse(Map.empty)
      case "identical" =>
        require(attrsList.forall(_ == attrsList.headOption.getOrElse(Map.empty)),
          "combine_attrs='identical' but attrs differ")
        attrsList.headOption.getOrElse(Map.empty)
      case "no_conflicts" =>
        attrsList.flatten.groupBy(_._1).map { case (k, kvs) =>
          val vs = kvs.map(_._2).distinct
          require(vs.size == 1, s"combine_attrs='no_conflicts': '$k' has ${vs.size} values")
          k -> vs.head
        }
      case "drop_conflicts" =>
        attrsList.flatten.groupBy(_._1).collect {
          case (k, kvs) if kvs.map(_._2).distinct.size == 1 => k -> kvs.head._2
        }
      case other =>
        throw new IllegalArgumentException(s"unknown combine_attrs '$other'")
    }
}
