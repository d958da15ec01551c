package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ccd.{CcdOps, Ccd}
import graft.ext.Dedup
import graft.pipeline.Classification
import graft.sources.Timeseries
import graft.types.AuxRow

class TileSpec extends AnyFunSuite {
  import SparkTestSession._

  test("tile model save/load round-trip") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_tile").toString
    val segments = CcdOps.segmentRecords(CcdOps.detect(CcdDemo.syntheticArd(spark, 4)))
    val aux = spark.createDataset((0 until 4).map { p =>
      AuxRow(-2565585, 3314805, -2565585 + p * 30, 3314805 - p * 30,
        Seq(730000), Some(Seq(100.0f + p)), Seq(1 + p % 2),
        Some(Seq(10 * p)), Some(Seq(0.5f)), Some(Seq(2.0f)), Some(Seq(1)))
    })
    val model = Classification.train(aux, segments, 1, 800000, numTrees = 3).get
    Classification.saveTile(spark, model, -2565585, 3314805,
      "rf-test", "2026-08-12T00:00:00", out)
    // A second tile's save must NOT erase the first (per-key upsert,
    // like the reference's CQL primary key).
    Classification.saveTile(spark, model, 100, 200,
      "rf-test", "2026-08-12T01:00:00", out)
    val loaded = Classification.loadTile(spark, out, -2565585, 3314805, "rf-test")
    assert(loaded.nonEmpty, "tile model must survive another tile's save")
    assert(loaded.get.stages.length == model.stages.length)
    assert(Classification.loadTile(spark, out, 100, 200, "rf-test").nonEmpty)
    assert(Classification.loadTile(spark, out, 0, 0, "rf-test").isEmpty,
      "keyed read must not match other tiles")
  }

  test("acquired range parses and filters observations") {
    assert(CcdOps.acquiredRange("0001-01-01/1970-01-01") == ((1, 719163)))
    val obs = Timeseries.explodeRows(CcdDemo.syntheticArd(spark, 2)).toDF()
    val lo = CcdOps.ordinalToIso(730000 + 10 * 16)
    val hi = CcdOps.ordinalToIso(730000 + 20 * 16)
    val filtered = Timeseries.filterAcquired(obs, s"$lo/$hi")
    assert(filtered.count() == 2 * 11, "inclusive 16-day steps in window")
  }

  test("spark.ml MinHashLSH variant finds the planted near-dup pairs") {
    val mlPairs = Dedup.minhashLshMl(spark, sf, maxDistance = 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("d02_ngram_jaccard")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // approx join distance = 1 - jaccard; threshold 0.5 matches d02's
    // jaccard >= 0.5. Require high recall of true pairs.
    val recall = if (exact.isEmpty) 1.0
      else exact.count(mlPairs.contains).toDouble / exact.size
    assert(recall >= 0.8, s"ML-LSH recall $recall over ${exact.size} pairs")
  }
}
