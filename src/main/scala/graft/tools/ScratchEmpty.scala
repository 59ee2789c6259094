package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch (round 15, deleted at close): observe round-14 verbs on
  * empty/degenerate inputs so EmptyInputSpec can pin the real
  * contracts. */
object ScratchEmpty {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def emptyDf(fields: (String, DataType)*) = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(fields.map { case (n, t) => StructField(n, t) }))
    def obs(name: String)(f: => org.apache.spark.sql.DataFrame): Unit =
      try {
        val rows = f.collect()
        println(s"OBS $name rows=${rows.length} " +
          rows.take(3).map(_.toString).mkString(" | "))
      } catch {
        case e: Throwable =>
          println(s"OBS $name THROWS ${e.getClass.getSimpleName}: " +
            e.getMessage.take(120).replace('\n', ' '))
      }

    val e3 = emptyDf("g" -> StringType, "v" -> LongType,
      "s" -> BooleanType)
    val docs0 = emptyDf("doc_id" -> LongType, "text" -> StringType)
    val edges0 = emptyDf("x" -> LongType, "y" -> LongType)
    val vecs0 = emptyDf("id" -> LongType,
      "vec" -> ArrayType(DoubleType))

    obs("kcore empty")(graft.llm.LinkAnalysis.kcore(edges0, "x", "y", 2))
    obs("fleiss empty")(graft.llm.Agreement.fleissKappa(
      e3.select(col("v").as("i"), col("g").as("r1"), col("g").as("r2")),
      col("i"), Seq(col("r1"), col("r2"))))
    obs("fleiss 1 item")(graft.llm.Agreement.fleissKappa(
      Seq((1L, "a", "a")).toDF("i", "r1", "r2"),
      col("i"), Seq(col("r1"), col("r2"))))
    obs("lshIndexEval empty")(
      graft.llm.Dedup.lshIndexEval(docs0, "doc_id", "text"))
    obs("weightConc empty")(
      graft.llm.CorpusStats.weightConcentration(e3, col("v")))
    obs("rocAuc empty")(graft.llm.Agreement.rocAuc(e3, col("s"),
      col("v"), c => c))
    obs("rocAuc 1class")(graft.llm.Agreement.rocAuc(
      Seq((true, 1L), (true, 2L)).toDF("s", "v"), col("s"), col("v"),
      c => c))
    obs("mi empty")(graft.numerics.Stats.mutualInformation(e3, col("g"),
      col("g")))
    obs("mi 1row")(graft.numerics.Stats.mutualInformation(
      Seq(("a", "b")).toDF("u", "w"), col("u"), col("w")))
    obs("jsd empty")(graft.llm.Drift.jsDivergence(e3, col("s"), col("g")))
    obs("jsd oneside")(graft.llm.Drift.jsDivergence(
      Seq((true, "x")).toDF("a", "w"), col("a"), col("w")))
    obs("silhouette empty")(
      graft.llm.Cluster.simplifiedSilhouette(vecs0, "id", "vec", 2, 2))
    obs("logRank empty")(graft.numerics.Survival.logRank(
      e3.select(col("v").as("dur"), col("v").as("ev"), col("s")),
      "dur", "ev", col("s")))
    obs("logRank allcensored")(graft.numerics.Survival.logRank(
      Seq((5L, 0, true), (6L, 0, false)).toDF("dur", "ev", "grp"),
      "dur", "ev", col("grp")))
    obs("logRank 1arm")(graft.numerics.Survival.logRank(
      Seq((5L, 1, true), (6L, 1, true)).toDF("dur", "ev", "grp"),
      "dur", "ev", col("grp")))
    obs("conformal empty")(graft.numerics.Conformal.splitInterval(
      e3.select(col("s").as("cal"), col("v").as("a"), col("v").as("p")),
      col("cal"), col("a"), col("p")))
    obs("conformal nocalib")(graft.numerics.Conformal.splitInterval(
      Seq((false, 5L, 4L)).toDF("cal", "a", "p"),
      col("cal"), col("a"), col("p")))
    obs("did empty")(graft.numerics.Bootstrap.didCI(
      e3.select(col("v").as("id"), col("s").as("t"), col("s").as("p"),
        col("v").as("y")),
      col("id"), col("t"), col("p"), col("y")))
    obs("powerMde empty")(graft.numerics.Stats.powerMde(e3, "g",
      col("s")))
    obs("powerMde 1arm")(graft.numerics.Stats.powerMde(
      Seq(("a", true), ("a", false)).toDF("g", "s"), "g", col("s")))
    obs("neyman empty")(graft.llm.Sampling.neymanAllocation(e3, "g",
      col("v"), 100L))
    obs("neyman 1stratum")(graft.llm.Sampling.neymanAllocation(
      Seq(("a", 1L), ("a", 3L)).toDF("g", "v"), "g", col("v"), 100L))
    obs("jamesStein empty")(graft.numerics.Stats.jamesSteinMeans(e3,
      "g", col("v")))
    obs("jamesStein 1group")(graft.numerics.Stats.jamesSteinMeans(
      Seq(("a", 1L), ("a", 3L)).toDF("g", "v"), "g", col("v")))
    spark.stop()
  }
}
