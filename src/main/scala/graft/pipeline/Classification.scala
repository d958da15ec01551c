package graft.pipeline

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ccd.CcdOps
import graft.ml.{Features, Rf}
import graft.sources.Sink
import graft.types.{AuxRow, TileRec}

/** The `classification` product pipeline (reference entry
  * ccdc/cli.py:51-74 → ccdc/core.py:156-251): train a land-cover RF on
  * the 3×3 tile neighborhood, then classify the tile's segments.
  *
  * The reference's apply/save stages were present but commented out
  * (ccdc/core.py:190-240); here both halves are live (SURVEY.md §3.2
  * counts the capability).
  */
object Classification {

  /** Restrict every aux pixel series to observations inside an ISO8601
    * `acquired` range "start/end" — the classification verb's -a flag
    * (reference ccdc/cli.py:62 threads it into the timeseries.aux
    * fetch, ccdc/core.py:127-153). Trimming the parallel arrays first
    * means `trends[0]` is the first observation INSIDE the window,
    * exactly what the reference's bounded fetch produced. Pixels left
    * with no observations drop out. */
  def acquiredWindow(aux: Dataset[AuxRow], acquired: String): Dataset[AuxRow] = {
    val spark = aux.sparkSession
    import spark.implicits._
    val (lo, hi) = CcdOps.acquiredRange(acquired)
    aux.map { r =>
      val keep = r.dates.zipWithIndex.collect {
        case (d, i) if d >= lo && d <= hi => i
      }
      def int(xs: Seq[Int]): Seq[Int] = keep.map(xs)
      def flt(xs: Option[Seq[Float]]): Option[Seq[Float]] = xs.map(keep.map(_))
      r.copy(dates = int(r.dates), dem = flt(r.dem), trends = int(r.trends),
        aspect = r.aspect.map(keep.map(_)), posidex = flt(r.posidex),
        slope = flt(r.slope), mpw = r.mpw.map(keep.map(_)))
    }.filter(_.dates.nonEmpty)
  }

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

  /** Tile-level training entry (reference ccdc/core.py:156-189 via
    * grid.training, ccdc/grid.py:69-89): training data = the 3×3 tile
    * neighborhood's chips. Both inputs are scoped with a broadcast
    * semi-join on the chip ids — geometry-driven partition pruning. */
  def trainForTile(spark: SparkSession, aux: Dataset[AuxRow],
      segments: DataFrame, x: Double, y: Double, msday: Int, meday: Int,
      numTrees: Int = 500): Option[PipelineModel] = {
    import spark.implicits._
    val chipIds = broadcast(
      graft.grid.Grid.trainingChips(x, y).toDF("cx", "cy"))
    val auxScoped = aux.join(chipIds, Seq("cx", "cy"), "left_semi")
      .as[AuxRow]
    val segScoped = segments.join(chipIds, Seq("cx", "cy"), "left_semi")
    train(auxScoped, segScoped, msday, meday, numTrees)
  }

  /** Tile-level classification entry (reference ccdc/core.py:190-240,
    * completed): classify exactly the containing tile's chips. */
  def classifyTile(model: PipelineModel, aux: Dataset[AuxRow],
      segments: DataFrame, x: Double, y: Double): DataFrame = {
    val spark = aux.sparkSession
    import spark.implicits._
    val chipIds = broadcast(
      graft.grid.Grid.classificationChips(x, y).toDF("cx", "cy"))
    classify(model,
      aux.join(chipIds, Seq("cx", "cy"), "left_semi").as[AuxRow],
      segments.join(chipIds, Seq("cx", "cy"), "left_semi"))
  }

  /** Persist per-tile trained-model metadata (reference: tile records,
    * ccdc/tile.py:16-43 + the driver-side write at ccdc/core.py:222-230
    * — S8's single-row literal source + S6 typed sink). The model
    * itself lands via spark.ml's writer; the tile row carries its
    * path where the reference carried a serialized blob. */
  def saveTile(spark: SparkSession, model: PipelineModel, tx: Int, ty: Int,
      name: String, updated: String, outDir: String): Unit = {
    import spark.implicits._
    // Model directory and tile-record partition are keyed by the full
    // (tx, ty, name) identity; dynamic partition overwrite gives the
    // per-key last-write-wins upsert the reference's CQL PK provided —
    // saving tile B must not erase tile A's record.
    val modelPath = s"$outDir/model/${tx}_${ty}_$name"
    model.write.overwrite().save(modelPath)
    Seq(TileRec(tx, ty, name, modelPath, updated)).toDF()
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("tx", "ty", "name")
      .parquet(s"$outDir/tile")
  }

  /** Load a tile's model back (round-trip of saveTile). */
  def loadTile(spark: SparkSession, outDir: String, tx: Int, ty: Int,
      name: String): Option[PipelineModel] = {
    import spark.implicits._
    val ids = Seq((tx, ty)).toDF("tx", "ty")
    Sink.readKeyed(spark, s"$outDir/tile", ids, Seq("tx", "ty"))
      .filter(col("name") === name)
      .collect().headOption
      .map(r => PipelineModel.load(r.getAs[String]("model")))
  }

  /** Classify: segments (sday/eday ≥ epoch guard, reference
    * ccdc/core.py:200) + aux → features → predictions joined back onto
    * their segments (J4, ccdc/segment.py:103-116) and dedensified. */
  def classify(model: PipelineModel, aux: Dataset[AuxRow],
      segments: DataFrame): DataFrame = {
    // Strict: excludes the empty-default placeholder segments
    // (sday=eday=0001-01-01, all model fields null — ccdc/pyccd.py:99-103),
    // which would otherwise classify on all-zero features.
    val eligible = segments.filter(
      col("sday") > CcdOps.ordinalToIso(1) && col("eday") > CcdOps.ordinalToIso(1))
    val fdf = Features.dataframe(aux.toDF(), eligible)
    val preds = Rf.classify(model, fdf)
    val joined = segments
      .join(preds, Seq("cx", "cy", "px", "py", "sday", "eday"), "inner")
    Rf.dedensify(joined
      .select(col("cx"), col("cy"), col("px"), col("py"),
        col("sday"), col("eday"), col("rfrawp")))
  }
}
