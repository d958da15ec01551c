package graft.grid

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One tile-catalog row: grid point + projection-meter bounds
  * (the reference's resources/conus.csv:1 column shape). */
case class TileRow(h: Int, v: Int,
    ulx: Double, uly: Double, lrx: Double, lry: Double)

/** S9: the tile catalog — the engine's answer to "which tiles exist".
  *
  * The reference shipped this as data (resources/conus.csv:1-728, 727
  * CONUS tiles) because its grid lived behind an HTTP service. Here the
  * grid is closed-form ([[Grid]]), so the catalog is a pure function of
  * the GridSpec and an (h, v) extent — generated distributed, never a
  * driver loop — with a CSV round-trip for interop with
  * conus.csv-shaped files.
  *
  * At 100 TB this is the top of the pruning funnel: catalog → tiles →
  * chips → files; a query for a region joins the catalog FIRST, so no
  * scan ever opens files outside the requested tiles.
  */
object TileCatalog {

  /** CONUS-sized default extent. The reference's conus.csv spans
    * h 0–32, v 0–21 — the FULL 33×22 rectangle: its 727 data lines
    * hold exactly 726 distinct (h, v) tiles (one line is
    * NUL-corrupted, and 115 list their corners scrambled), so
    * [[generate]]'s clean 726-row rectangle covers the identical tile
    * set (GridSpec pins the parity against a verbatim fixture). */
  val ConusH = 33
  val ConusV = 22

  /** All (h, v) tiles of an extent with closed-form bounds —
    * `Grid.extents` in column form over a distributed range. */
  def generate(spark: SparkSession, nH: Int = ConusH, nV: Int = ConusV): Dataset[TileRow] = {
    import spark.implicits._
    val g = Grid.tile
    spark.range(nH.toLong * nV)
      .select(
        (col("id") / nV).cast("int").as("h"),
        (col("id") % nV).cast("int").as("v"))
      .select(col("h"), col("v"),
        ((col("h") * g.sx - g.tx) / g.rx).as("ulx"),
        ((col("v") * g.sy - g.ty) / g.ry).as("uly"))
      .select(col("h"), col("v"), col("ulx"), col("uly"),
        (col("ulx") + lit(g.sx)).as("lrx"),
        (col("uly") - lit(g.sy)).as("lry"))
      .as[TileRow]
  }

  val schema: StructType = StructType(Seq(
    StructField("h", IntegerType), StructField("v", IntegerType),
    StructField("ulx", DoubleType), StructField("uly", DoubleType),
    StructField("lrx", DoubleType), StructField("lry", DoubleType)))

  /** conus.csv-shaped write (header h,v,ulx,uly,lrx,lry). */
  def writeCsv(catalog: Dataset[TileRow], path: String): Unit =
    catalog.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(path)

  /** Schema'd read of a conus.csv-shaped catalog. */
  def readCsv(spark: SparkSession, path: String): Dataset[TileRow] = {
    import spark.implicits._
    spark.read.option("header", "true").schema(schema).csv(path).as[TileRow]
  }

  /** The catalog rows whose tiles intersect a bounding box — the
    * region→tiles pruning join (predicate is pure column algebra, so
    * it pushes into the catalog scan). */
  def covering(catalog: Dataset[TileRow],
      xmin: Double, ymin: Double, xmax: Double, ymax: Double): Dataset[TileRow] =
    catalog.filter(col("ulx") < xmax && col("lrx") > xmin &&
      col("uly") > ymin && col("lry") < ymax)
}
