package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ccd.CcdOps
import graft.ext.Dedup
import graft.sources.{Sink, Timeseries}

class SourcesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("timeseries assemble/explode round-trip, arrays date-descending") {
    import spark.implicits._
    val ard = CcdDemo.syntheticArd(spark, 4)
    val long = Timeseries.explodeRows(ard)
    assert(long.count() == 4 * 80)
    val back = Timeseries.assemble(long.toDF())
    // dates come back descending (reference order, ccdc/timeseries.py:115)
    val row = back.filter(col("px") === -2565585).head()
    val dates = row.dates
    assert(dates == dates.sorted.reverse, "dates must be descending")
    // content round-trips (original was ascending)
    val orig = ard.filter(col("px") === -2565585).head()
    assert(dates.sorted == orig.dates.sorted)
    assert(row.blues.reverse == orig.blues,
      "band arrays must stay aligned to dates")
    assert(back.count() == 4)
  }

  test("banded simhash pairs == brute-force pairs at hamming<=3") {
    val sig = SparkEntry.queries("d04_simhash")(spark, sf)
    val banded = Dedup.simhashPairs(sig, 3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = sig.as("a").join(sig.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute, "banding must lose no pairs at hamming<=3")
  }

  test("prefix-filtered jaccard (d02) == exhaustive shingle-blocked join, exactly") {
    // Total-recall proof made empirical: the registered prefix-filtered
    // entry must emit the exact same (pair, score) set as the
    // exhaustive join the DuckDB oracle mirrors.
    val prefix = SparkEntry.queries("d02_ngram_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exhaustive = Dedup.jaccardPairsExhaustive(Dedup.shingles(spark, sf))
      .filter(col("jaccard") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(prefix == exhaustive,
      s"prefix filtering must lose nothing: ${prefix.size} vs ${exhaustive.size}")
  }

  test("partitioned write upserts per key: overlapping batch keeps unrelated keys") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val batch1 = Seq((1, 10, "a1"), (2, 20, "b1")).toDF("cx", "cy", "v")
    val batch2 = Seq((2, 20, "b2"), (3, 30, "c1")).toDF("cx", "cy", "v")
    Sink.write(batch1, dir, Seq("cx", "cy"), Seq("cx", "cy"))
    Sink.write(batch2, dir, Seq("cx", "cy"), Seq("cx", "cy"))
    val got = spark.read.parquet(dir)
      .collect().map(r => (r.getAs[Int]("cx"), r.getAs[String]("v"))).toSet
    // key 1 (absent from batch2) must survive; key 2 must be batch2's row
    assert(got == Set((1, "a1"), (2, "b2"), (3, "c1")),
      s"expected per-key last-write-wins, got $got")
  }

  test("partitioned layout prunes partitions at the scan (PartitionFilters)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    val rows = (0 until 100).map(i => (i.toLong, s"src${i % 4}", s"text-$i"))
      .toDF("doc_id", "source", "text")
    Sink.write(rows, dir, Seq("doc_id"), Seq("source"))
    val q = spark.read.parquet(dir).filter(col("source") === "src1")
    val plan = q.queryExecution.executedPlan.toString
    // the partition-column predicate must prune DIRECTORIES (metadata
    // only), not run as a data filter over every file
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("src1"),
      s"source predicate must reach PartitionFilters:\n$plan")
    assert(q.count() == 25)
    // the pruned scan reads exactly the one partition's files
    assert(q.select(input_file_name()).distinct().collect()
      .forall(_.getString(0).contains("source=src1")))
  }

  test("tile-partitioned segments: one-tile query prunes to that tile's " +
      "directory; a tile-dimension join prunes dynamically (DPP)") {
    // SURVEY §4 partition-pruning row (reference ccdc/grid.py:23-53):
    // the reference pruned by geometry — tile→chip enumeration decided
    // which Cassandra partitions were ever read. Here the same bound
    // comes from the optimizer: segments land (tx,ty)-partitioned via
    // Sink.write, so a tile-restricted query is a metadata-only
    // directory prune, and a join against a filtered tile-dimension
    // frame prunes the same directories at RUNTIME from the dimension's
    // broadcast (Catalyst dynamic partition pruning) — no full scan in
    // either shape, at any corpus size.
    import spark.implicits._
    import graft.grid.Grid
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    val base = CcdOps.segmentRecords(CcdOps.detect(CcdDemo.syntheticArd(spark, 4)))
    val tiles = Seq((13, 6), (14, 6), (13, 7), (14, 7)).map { case (h, v) =>
      val (ulx, uly) = Grid.cellUl(h, v, Grid.tile)
      (h, v, ulx.toInt, uly.toInt)
    }
    val segs = tiles.map { case (_, _, ulx, uly) =>
      base.withColumn("tx", lit(ulx)).withColumn("ty", lit(uly))
    }.reduce(_ unionByName _)
    Sink.write(segs, dir, Seq("tx", "ty", "cx", "cy", "px", "py", "sday", "eday"),
      Seq("tx", "ty"))

    // 1) static: the tile literal reaches PartitionFilters and the scan
    // opens only that tile's directory
    val (_, _, ulx0, uly0) = tiles.head
    val one = spark.read.parquet(dir)
      .filter(col("tx") === ulx0 && col("ty") === uly0)
    val p1 = one.queryExecution.executedPlan.toString
    assert(p1.contains("PartitionFilters: [") &&
      p1.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains(ulx0.toString),
      s"tile predicate must prune directories, not filter rows:\n$p1")
    assert(one.count() == base.count())
    assert(one.select(input_file_name()).distinct().collect()
      .forall(_.getString(0).contains(s"tx=$ulx0/ty=$uly0")))

    // 2) dynamic: the tile ids are only known from a dimension predicate
    // (the reference's "which tiles cover this AOI" lookup); the scan
    // must carry a dynamicpruningexpression fed by the dimension's
    // broadcast rather than scanning all tiles
    val dimDir = java.nio.file.Files.createTempDirectory("graft_tiledim").toString
    tiles.map { case (h, v, ulx, uly) => (ulx, uly, f"h$h%03dv$v%03d") }
      .toDF("tx", "ty", "tile_name")
      .write.mode("overwrite").parquet(dimDir)
    val joined = spark.read.parquet(dir)
      .join(spark.read.parquet(dimDir)
        .filter(col("tile_name") === "h013v006"), Seq("tx", "ty"))
    assert(joined.count() == base.count())
    val p2 = joined.queryExecution.executedPlan.toString
    assert(p2.contains("dynamicpruningexpression"),
      s"tile-dimension join must prune partitions at runtime (DPP):\n$p2")
  }

  test("unpartitioned write remains a documented full refresh") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_refresh").toString
    Sink.write(Seq((1, "a")).toDF("k", "v"), dir, Seq("k"))
    Sink.write(Seq((2, "b")).toDF("k", "v"), dir, Seq("k"))
    assert(spark.read.parquet(dir).collect().map(_.getAs[Int]("k")).toSet == Set(2))
  }

  test("keyed read restricts the scan to requested ids") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val segs = CcdOps.segmentRecords(CcdOps.detect(CcdDemo.syntheticArd(spark, 4)))
    Sink.write(segs, s"$dir/segment", Seq("cx", "cy", "px", "py", "sday", "eday"))
    val ids = Seq((-2565585, 3314805, -2565585, 3314805)).toDF("cx", "cy", "px", "py")
    val got = Sink.readKeyed(spark, s"$dir/segment", ids, Seq("cx", "cy", "px", "py"))
    assert(got.count() >= 1)
    assert(got.select("px").distinct().head().getInt(0) == -2565585)
  }

  test("segment schema parity: field names and types match the reference") {
    import spark.implicits._
    val seg = CcdOps.detect(CcdDemo.syntheticArd(spark, 1)).toDF()
    // reference ccdc/pyccd.py:39-81 field order
    val expected = Seq(
      "cx" -> "int", "cy" -> "int", "px" -> "int", "py" -> "int",
      "sday" -> "string", "eday" -> "string", "bday" -> "string",
      "chprob" -> "float", "curqa" -> "int",
      "blmag" -> "float", "grmag" -> "float", "remag" -> "float",
      "nimag" -> "float", "s1mag" -> "float", "s2mag" -> "float",
      "thmag" -> "float",
      "blrmse" -> "float", "grrmse" -> "float", "rermse" -> "float",
      "nirmse" -> "float", "s1rmse" -> "float", "s2rmse" -> "float",
      "thrmse" -> "float",
      "blcoef" -> "array<float>", "grcoef" -> "array<float>",
      "recoef" -> "array<float>", "nicoef" -> "array<float>",
      "s1coef" -> "array<float>", "s2coef" -> "array<float>",
      "thcoef" -> "array<float>",
      "blint" -> "float", "grint" -> "float", "reint" -> "float",
      "niint" -> "float", "s1int" -> "float", "s2int" -> "float",
      "thint" -> "float",
      "dates" -> "array<string>", "mask" -> "array<tinyint>",
      "rfrawp" -> "array<float>")
    val actual = seg.schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq
    assert(actual == expected, s"schema drift:\n${actual.mkString("\n")}")
  }
}
