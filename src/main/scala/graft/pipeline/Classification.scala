package graft.pipeline

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.ccd.CcdOps
import graft.ml.{Features, Rf}
import graft.types.AuxRow

/** The `classification` product pipeline (reference entry
  * ccdc/cli.py:51-74 → ccdc/core.py:156-251): train a land-cover RF on
  * the 3×3 tile neighborhood, then classify the tile's segments.
  *
  * The reference's apply/save stages were present but commented out
  * (ccdc/core.py:190-240); here both halves are live (SURVEY.md §3.2
  * counts the capability).
  */
object Classification {

  /** Training-segment window filter. Segment days are ISO strings for
    * schema parity; bounds arrive as ordinals and are formatted to ISO
    * for the compare — lexicographic order == chronological order for
    * ISO dates, which avoids the reference's latent string-vs-int
    * comparison (ccdc/randomforest.py:69; SURVEY.md §7.4.2). */
  def windowFilter(segments: DataFrame, msday: Int, meday: Int): DataFrame =
    segments.filter(col("sday") >= CcdOps.ordinalToIso(msday) &&
      col("eday") <= CcdOps.ordinalToIso(meday))

  /** Train: aux (label rasters) + segments → features → RF model.
    * Reference: ccdc/randomforest.py:42-87. */
  def train(aux: Dataset[AuxRow], segments: DataFrame,
      msday: Int, meday: Int, numTrees: Int = 500): Option[PipelineModel] = {
    val usable = aux
      .filter(!element_at(col("trends"), 1).isin(0, 9)) // ccdc/randomforest.py:64
      .toDF()
    val windowed = windowFilter(segments, msday, meday)
    val fdf = Features.dataframe(usable, windowed)
    Rf.train(fdf, numTrees)
  }

  /** Classify: segments (sday/eday ≥ epoch guard, reference
    * ccdc/core.py:200) + aux → features → predictions joined back onto
    * their segments (J4, ccdc/segment.py:103-116) and dedensified. */
  def classify(model: PipelineModel, aux: Dataset[AuxRow],
      segments: DataFrame): DataFrame = {
    val eligible = segments.filter(
      col("sday") >= CcdOps.ordinalToIso(1) && col("eday") >= CcdOps.ordinalToIso(1))
    val fdf = Features.dataframe(aux.toDF(), eligible)
    val preds = Rf.classify(model, fdf)
    val joined = segments
      .join(preds, Seq("cx", "cy", "px", "py", "sday", "eday"), "inner")
    Rf.dedensify(joined
      .select(col("cx"), col("cy"), col("px"), col("py"),
        col("sday"), col("eday"), col("rfrawp")))
  }
}
