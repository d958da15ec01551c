package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ccd.CcdOps
import graft.types.ArdRow

/** CCD change detection exposed through the driver's query gate.
  *
  * The driver's tables carry no rasters, so the pixel series derive
  * deterministically FROM the provided data: each supplier becomes a
  * "pixel" whose observation dates are its lineitem ship dates and
  * whose bands are integer transforms of shipment quantities/prices.
  * Everything is a pure function of the input tables — rows are stable
  * across runs, which is what the rows-only check (no DuckDB oracle:
  * CCD isn't SQL-expressible) verifies. The real point is that the
  * flagship operator — assemble → flatMap(ccd) → segments — runs and
  * is benchmarked at every scale factor.
  */
object CcdQueries {

  /** Python-ordinal day of a timestamp column (CcdOps.ordinalToIso's
    * inverse, in column form): days since 1970-01-01 plus 719163.
    * Goes through DateType so it works for TIMESTAMP and TIMESTAMP_NTZ. */
  private def ordinalOf(ts: org.apache.spark.sql.Column) =
    (datediff(ts.cast("date"), to_date(lit("1970-01-01"))) + lit(719163)).cast("int")

  /** One ArdRow per supplier from its lineitem history. */
  def supplierSeries(s: SparkSession, dir: String): org.apache.spark.sql.Dataset[ArdRow] = {
    import s.implicits._
    val li = Tables(s, dir, "lineitem")
      .select(
        col("l_suppkey"),
        ordinalOf(col("l_shipdate")).as("date"),
        (col("l_quantity") * 100).cast("int").as("blue"),
        (col("l_extendedprice") / 10).cast("int").as("green"),
        (col("l_discount") * 10000).cast("int").as("red"),
        (col("l_tax") * 10000).cast("int").as("nir"),
        (col("l_orderkey") % 1000).cast("int").as("swir1"),
        (col("l_partkey") % 1000).cast("int").as("swir2"),
        col("l_linenumber").cast("int").as("thermal"))
    li.groupBy(col("l_suppkey"))
      .agg(sort_array(collect_list(struct(col("date"), col("blue"),
        col("green"), col("red"), col("nir"), col("swir1"), col("swir2"),
        col("thermal")))).as("o"))
      .select(
        col("l_suppkey").cast("int").as("cx"),
        lit(0).as("cy"),
        col("l_suppkey").cast("int").as("px"),
        lit(0).as("py"),
        col("o.date").as("dates"),
        col("o.blue").as("blues"),
        col("o.green").as("greens"),
        col("o.red").as("reds"),
        col("o.nir").as("nirs"),
        col("o.swir1").as("swir1s"),
        col("o.swir2").as("swir2s"),
        col("o.thermal").as("thermals"),
        transform(col("o.date"), _ => lit(0)).as("qas"))
      .as[ArdRow]
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flagship CCDC operator over table-derived pixel series. Output:
    // per-segment key columns + fitted-window metadata (deterministic;
    // rows-only checked — CCD has no SQL oracle).
    "c01_ccd_segments" -> ((s, dir) => {
      CcdOps.detect(supplierSeries(s, dir))
        .select(col("cx"), col("px"), col("sday"), col("eday"),
          col("bday"), col("curqa"),
          size(col("dates")).as("n_obs"))
    })
  )

  /** No oracle — intentionally absent (rows-only check). */
  val oracle: Map[String, String] = Map.empty
}
