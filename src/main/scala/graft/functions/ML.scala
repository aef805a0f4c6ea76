package graft.functions

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{OneHotEncoder, StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** ML featurization (reference `ML.schema` / `ML.featuremat`,
  * `src/ml.jl:9-178`): per-column stats → standardized continuous +
  * one-hot categorical feature matrix, as a spark.ml Pipeline.
  *
  * Hints mirror the reference's (`docs/src/ml.md:17-70`): a column can be
  * forced Continuous/Categorical or dropped. The fitted pipeline is the
  * distributed analog of `ML.schema` (its fit pass computes the same
  * mean/std/countmap statistics); `transform` is `featuremat`.
  */
object ML {

  sealed trait Hint
  case object Continuous extends Hint
  case object Categorical extends Hint
  case object Drop extends Hint

  /** Column-role inference: numeric → continuous, string → categorical
    * (the reference uses Variance vs CountMap stats the same way). */
  def roles(df: DataFrame, hints: Map[String, Hint] = Map.empty): Map[String, Hint] =
    df.schema.fields.map { f =>
      f.name -> hints.getOrElse(f.name, f.dataType match {
        case _: NumericType => Continuous
        case StringType => Categorical
        case _ => Drop
      })
    }.toMap

  /** Build the featurization pipeline: continuous cols assembled +
    * standardized, categorical cols indexed + one-hot, all concatenated
    * into `features`. */
  def featurePipeline(df: DataFrame, hints: Map[String, Hint] = Map.empty): Pipeline = {
    val r = roles(df, hints)
    val cont = r.collect { case (c, Continuous) => c }.toSeq.sorted
    val cat = r.collect { case (c, Categorical) => c }.toSeq.sorted
    val contStages =
      if (cont.nonEmpty) Seq(
        new VectorAssembler().setInputCols(cont.toArray).setOutputCol("__cont"),
        new StandardScaler().setInputCol("__cont").setOutputCol("__cont_std")
          .setWithMean(true).setWithStd(true))
      else Nil
    val catStages = cat.flatMap { c =>
      Seq(new StringIndexer().setInputCol(c).setOutputCol(s"__idx_$c")
            .setStringOrderType("alphabetAsc"),
          new OneHotEncoder().setInputCol(s"__idx_$c").setOutputCol(s"__oh_$c"))
    }
    val finalCols = (if (cont.nonEmpty) Seq("__cont_std") else Nil) ++ cat.map(c => s"__oh_$c")
    val assembler = new VectorAssembler().setInputCols(finalCols.toArray).setOutputCol("features")
    new Pipeline().setStages((contStages ++ catStages :+ assembler).toArray)
  }

  /** `featuremat(schema, t)`: fit + transform to the features column. */
  def featuremat(df: DataFrame, hints: Map[String, Hint] = Map.empty): DataFrame = {
    val keep = roles(df, hints).collect { case (c, h) if h != Drop => c }.toSeq.sorted
    val input = df.select(keep.map(col): _*).na.drop()
    featurePipeline(input, hints).fit(input).transform(input)
  }
}
