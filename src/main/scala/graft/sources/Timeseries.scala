package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.types.ArdRow

/** Pixel time-series assembly — the Spark-native form of the merlin
  * transpose the reference did inside executor HTTP tasks (reference:
  * chip rasters → per-pixel parallel arrays, observable contract at
  * ccdc/timeseries.py:104-115; call site :120-123; SURVEY.md A3).
  *
  * Long-format observations (one row per pixel per acquisition) become
  * one row per pixel with date-descending parallel arrays. ONE shuffle
  * on the pixel key with map-side partial `collect_list`; the
  * struct-sort + per-band unzip stay codegen'd projections. At 100 TB
  * this is the engine's widest shuffle — keeping it single-pass (one
  * collect of the full struct, not one per band) is the point.
  */
object Timeseries {

  /** One observation of one pixel. */
  case class Obs(cx: Int, cy: Int, px: Int, py: Int, date: Int,
      blue: Int, green: Int, red: Int, nir: Int,
      swir1: Int, swir2: Int, thermal: Int, qa: Int)

  private val bandFields = Seq(
    "date" -> "dates", "blue" -> "blues", "green" -> "greens",
    "red" -> "reds", "nir" -> "nirs", "swir1" -> "swir1s",
    "swir2" -> "swir2s", "thermal" -> "thermals", "qa" -> "qas")

  /** Long observations → ArdRow per pixel, arrays date-descending.
    * Duplicate-date observations are all retained (ordered among
    * themselves by the full observation struct, so output is
    * deterministic under any partitioning); same-day dedup policy
    * belongs to the consumer (Ccd.detect keeps the first per day). */
  def assemble(obs: DataFrame): Dataset[ArdRow] = {
    import obs.sparkSession.implicits._
    val obsStruct = struct(col("date"), col("blue"), col("green"),
      col("red"), col("nir"), col("swir1"), col("swir2"),
      col("thermal"), col("qa"))
    val gathered = obs
      .groupBy(col("cx"), col("cy"), col("px"), col("py"))
      .agg(reverse(array_sort(collect_list(obsStruct))).as("o"))
    bandFields.foldLeft(gathered) { case (df, (field, out)) =>
        df.withColumn(out, col("o").getField(field))
      }
      .drop("o")
      .as[ArdRow]
  }

  /** Long AUX observations → AuxRow per pixel (the AUX twin of
    * assemble — reference timeseries.aux, ccdc/timeseries.py:46-55;
    * aux rasters are static so each pixel has a single-date series). */
  def assembleAux(obs: DataFrame): Dataset[graft.types.AuxRow] = {
    import obs.sparkSession.implicits._
    val obsStruct = struct(col("date"), col("dem"), col("trends"),
      col("aspect"), col("posidex"), col("slope"), col("mpw"))
    obs.groupBy(col("cx"), col("cy"), col("px"), col("py"))
      .agg(reverse(array_sort(collect_list(obsStruct))).as("o"))
      .select(col("cx"), col("cy"), col("px"), col("py"),
        col("o.date").as("dates"),
        col("o.dem").as("dem"),
        col("o.trends").as("trends"),
        col("o.aspect").as("aspect"),
        col("o.posidex").as("posidex"),
        col("o.slope").as("slope"),
        col("o.mpw").as("mpw"))
      .as[graft.types.AuxRow]
  }

  /** Restrict long observations to an acquired range (reference:
    * the `acquired` ISO8601 window applied at fetch; here an ordinary
    * pushed-down predicate on the observation date). */
  def filterAcquired(obs: DataFrame, acquired: String): DataFrame = {
    val (lo, hi) = graft.ccd.CcdOps.acquiredRange(acquired)
    obs.filter(col("date") >= lo && col("date") <= hi)
  }

  /** ArdRow per pixel → long observations (the inverse expansion —
    * the reference's chip→pixels flatMap shape, SURVEY.md S3). */
  def explodeRows(ard: Dataset[ArdRow]): Dataset[Obs] = {
    import ard.sparkSession.implicits._
    ard.flatMap { r =>
      r.dates.indices.map { i =>
        Obs(r.cx, r.cy, r.px, r.py, r.dates(i), r.blues(i), r.greens(i),
          r.reds(i), r.nirs(i), r.swir1s(i), r.swir2s(i), r.thermals(i),
          r.qas(i))
      }
    }
  }
}
