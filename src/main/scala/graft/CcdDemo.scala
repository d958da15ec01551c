package graft

import org.apache.spark.sql.SparkSession

import graft.ccd.Ccd
import graft.pipeline.{ChangeDetection, Classification}
import graft.types.{ArdRow, AuxRow}

/** End-to-end demo of the CCDC product pipelines on deterministic
  * synthetic ARD (the container has no real Landsat data): change
  * detection over one chip → three parquet products → RF train +
  * classify. Usage: runMain graft.CcdDemo /tmp/ccd_out
  */
object CcdDemo {

  private def noise(i: Int, b: Int): Double = {
    val x = math.sin(i * 12.9898 + b * 78.233) * 43758.5453
    (x - math.floor(x) - 0.5) * 40.0
  }

  def syntheticArd(spark: SparkSession, nPixels: Int): org.apache.spark.sql.Dataset[ArdRow] = {
    import spark.implicits._
    val cx = -2565585; val cy = 3314805
    val rows = for (p <- 0 until nPixels) yield {
      val dates = Array.tabulate(80)(i => 730000 + i * 16)
      val step = if (p % 2 == 1) Some(730000 + 40 * 16) else None
      def band(b: Int): Seq[Int] = dates.zipWithIndex.map { case (d, i) =>
        val base = 1000.0 + 100 * b + 300.0 * math.cos(2 * math.Pi * d / Ccd.YearDays)
        (base + step.filter(d >= _).map(_ => 1500.0).getOrElse(0.0) + noise(i, b)).round.toInt
      }.toSeq
      ArdRow(cx, cy, cx + p * 30, cy - p * 30, dates.toSeq,
        band(0), band(1), band(2), band(3), band(4), band(5), band(6),
        Seq.fill(80)(0))
    }
    spark.createDataset(rows)
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_ccd_demo")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-ccd-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Round the synthetic series through the long-format assembly path
    // (the merlin-transpose twin) so the demo drives the full source →
    // assemble → detect pipeline.
    val ard = graft.sources.Timeseries.assemble(
      graft.sources.Timeseries.explodeRows(syntheticArd(spark, 16)).toDF())
    val (chips, pixels, segs) = ChangeDetection.run(ard, outDir)
    println(s"changedetection: chips=$chips pixels=$pixels segments=$segs -> $outDir")

    val segments = spark.read.parquet(s"$outDir/segment")
    val aux = spark.createDataset((0 until 16).map { p =>
      AuxRow(-2565585, 3314805, -2565585 + p * 30, 3314805 - p * 30,
        dates = Seq(730000), dem = Some(Seq(100.0f + p)),
        trends = Seq(1 + p % 3), aspect = Some(Seq(10 * p)),
        posidex = Some(Seq(0.5f)), slope = Some(Seq(2.0f)),
        mpw = Some(Seq(1)))
    })
    Classification.train(aux, segments, 1, 800000, numTrees = 20) match {
      case Some(model) =>
        Classification.saveTile(spark, model, -2565585, 3314805,
          "rf-demo", java.time.Instant.now().toString, outDir)
        val reloaded = Classification
          .loadTile(spark, outDir, -2565585, 3314805, "rf-demo")
          .getOrElse(sys.error("tile model failed to round-trip"))
        val classified = Classification.classify(reloaded, aux, segments)
        println(s"classification: ${classified.count()} classified segments" +
          " (model persisted + reloaded via tile record)")
        classified.show(5, truncate = false)
      case None => println("classification: no training data")
    }
    spark.stop()
  }
}
