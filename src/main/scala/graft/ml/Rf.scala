package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.feature.{StringIndexer, VectorIndexer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Random-forest training & classification (reference
  * ccdc/randomforest.py — identical spark.ml stages).
  */
object Rf {

  /** StringIndexer → VectorIndexer → RF(numTrees). Reference pins
    * numTrees=500, maxCategories=8 (ccdc/randomforest.py:36-39);
    * numTrees is a parameter so tests can train small forests. */
  def pipeline(numTrees: Int = 500): Pipeline = {
    val lindex = new StringIndexer()
      .setInputCol("label").setOutputCol("label_index")
      .setHandleInvalid("keep")
    val findex = new VectorIndexer()
      .setInputCol("features").setOutputCol("feature_index")
      .setMaxCategories(8)
    val rf = new RandomForestClassifier()
      .setLabelCol("label_index").setFeaturesCol("feature_index")
      .setNumTrees(numTrees).setSeed(42L)
    new Pipeline().setStages(Array(lindex, findex, rf))
  }

  /** Train over a features dataframe; None when no training rows
    * (reference guard, ccdc/randomforest.py:73-75). */
  def train(fdf: DataFrame, numTrees: Int = 500): Option[PipelineModel] =
    if (fdf.isEmpty) None else Some(pipeline(numTrees).fit(fdf))

  /** model.transform → keyed raw predictions (reference
    * ccdc/randomforest.py:90-103). */
  def classify(model: PipelineModel, fdf: DataFrame): DataFrame =
    model.transform(fdf)
      .select("cx", "cy", "px", "py", "sday", "eday", "rawPrediction")
      .withColumnRenamed("rawPrediction", "rfrawp")

  /** Vector → plain float array + chipx/chipy/pixelx/pixely renames
    * (reference dedensify, ccdc/randomforest.py:106-123 — an RDD
    * round-trip there; a single codegen'd projection here). */
  def dedensify(classified: DataFrame): DataFrame =
    classified.select(
      col("cx").as("chipx"), col("cy").as("chipy"),
      col("px").as("pixelx"), col("py").as("pixely"),
      col("sday"), col("eday"),
      vector_to_array(col("rfrawp")).cast("array<float>").as("rfrawp"))
}
