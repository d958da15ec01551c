package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.grid.Grid

class GridSpec extends AnyFunSuite {

  test("tile contains 2500 chips, training neighborhood 22500") {
    val t = Grid.tileOf(Grid.tile.tx + 10.0, Grid.tile.ty - 10.0)
    assert(t.chips.size == 2500)
    assert(t.chips.distinct.size == 2500)
    assert(Grid.trainingChips(0.0, 0.0).size == 22500)
    assert(Grid.classificationChips(0.0, 0.0).size == 2500)
  }

  test("affine matches the reference's snap fixture and conus.csv origin") {
    // cell (0, 0) sits at (−tx, ty) — resources/conus.csv:2's ulx/uly
    assert(Grid.cellUl(0, 0, Grid.tile) == ((-Grid.tile.tx, Grid.tile.ty)))
    assert(Grid.gridPt(-Grid.tile.tx, Grid.tile.ty, Grid.tile) == ((0, 0)))
    assert(Grid.snap(-Grid.tile.tx, Grid.tile.ty, Grid.tile) ==
      ((-Grid.tile.tx, Grid.tile.ty)))
    // reference test/data/snap_response.json: tile grid-pt (13, 6) at
    // proj-pt (−615585, 2414805); chip (674, 312) at (−543585, 2378805)
    assert(Grid.cellUl(13, 6, Grid.tile) == ((-615585.0, 2414805.0)))
    assert(Grid.gridPt(-615585.0 + 10.0, 2414805.0 - 10.0, Grid.tile) == ((13, 6)))
    assert(Grid.cellUl(674, 312, Grid.chip) == ((-543585.0, 2378805.0)))
    assert(Grid.gridPt(-543585.0 + 10.0, 2378805.0 - 10.0, Grid.chip) == ((674, 312)))
  }

  test("reference conus.csv fixture: identical tile set, grid-consistent bounds") {
    import SparkTestSession._
    // src/test/resources/conus.csv is a verbatim copy of the
    // reference's resources/conus.csv:1-728 — 727 data lines holding
    // 726 distinct (h, v) tiles (the full 33×22 rectangle), one line
    // NUL-corrupted, 115 rows with their corner columns scrambled.
    val path = getClass.getResource("/conus.csv").toString
    val rows = grid.TileCatalog.readCsv(spark, path)
      .filter(org.apache.spark.sql.functions.col("h").isNotNull) // drop the corrupt line
      .collect()
    assert(rows.length == 726, s"727 raw lines minus the corrupt one, got ${rows.length}")
    val hv = rows.map(r => (r.h, r.v)).toSet
    assert(hv.size == 726)
    assert(grid.TileCatalog.generate(spark).collect().map(r => (r.h, r.v)).toSet == hv,
      "generate()'s 33×22 rectangle must be exactly the curated CONUS tile set")
    var exact = 0
    rows.foreach { r =>
      val (ulx, uly) = Grid.cellUl(r.h, r.v, Grid.tile)
      val t = Grid.tileOf(ulx + 75000.0, uly - 75000.0)
      assert((t.h, t.v) == ((r.h, r.v)), s"tileOf disagrees with curated row $r")
      assert((t.ulx, t.uly) == ((ulx, uly)))
      // every curated corner value belongs to the closed-form cell;
      // well-formed rows (611 of 726) must match it exactly
      assert(Set(r.ulx, r.lrx).subsetOf(Set(t.ulx, t.lrx)) &&
        Set(r.uly, r.lry).subsetOf(Set(t.uly, t.lry)), s"corner drift at $r")
      if (r.ulx == t.ulx && r.uly == t.uly && r.lrx == t.lrx && r.lry == t.lry)
        exact += 1
    }
    assert(exact == 611, s"expected 611 well-formed curated rows, got $exact")
  }

  test("snap is idempotent and cells contain their points (point sweep)") {
    for {
      xr <- -40 to 40 by 7
      yr <- -40 to 40 by 7
    } {
      val x = Grid.tile.tx + xr.toDouble * 977.0
      val y = Grid.tile.ty + yr.toDouble * 977.0
      for (g <- Seq(Grid.tile, Grid.chip)) {
        val (sx, sy) = Grid.snap(x, y, g)
        assert(Grid.snap(sx, sy, g) == ((sx, sy)))
        assert(sx <= x && x < sx + g.sx)
        assert(sy >= y && y > sy - g.sy)
      }
    }
  }

  test("every chip of a tile snaps back into that tile") {
    val t = Grid.tileOf(-1000.0, 1000.0)
    t.chips.foreach { case (cx, cy) =>
      val (tx2, ty2) = Grid.snap(cx.toDouble, cy.toDouble, Grid.tile)
      assert(tx2 == t.x && ty2 == t.y)
      // and the chip coordinate is chip-aligned
      assert(Grid.snap(cx.toDouble, cy.toDouble, Grid.chip) ==
        ((cx.toDouble, cy.toDouble)))
    }
  }

  test("near returns 9 distinct neighbors including self") {
    val n = Grid.near(0.0, 0.0, Grid.tile)
    assert(n.size == 9 && n.distinct.size == 9)
    assert(n.contains(Grid.snap(0.0, 0.0, Grid.tile)))
  }

  test("pixel coordinates: 10000 per chip") {
    val p = Grid.pixelCoordinates(2565585, 3314805)
    assert(p.size == 10000 && p.distinct.size == 10000)
  }

  test("tile catalog agrees with Grid.tileOf geometry for sampled tiles") {
    import SparkTestSession._
    val cat = grid.TileCatalog.generate(spark).collect()
    assert(cat.length == grid.TileCatalog.ConusH * grid.TileCatalog.ConusV)
    assert(cat.map(r => (r.h, r.v)).distinct.length == cat.length)
    // catalog bounds == closed-form geometry at each sampled tile's center
    cat.filter(r => (r.h * 31 + r.v * 17) % 50 == 0).foreach { r =>
      val t = Grid.tileOf(r.ulx + 75000.0, r.uly - 75000.0)
      assert((t.h, t.v) == ((r.h, r.v)), s"grid point drift at $r")
      assert((t.ulx, t.uly, t.lrx, t.lry) == ((r.ulx, r.uly, r.lrx, r.lry)),
        s"bounds drift at $r vs $t")
    }
  }

  test("tile catalog CSV round-trips and covering() prunes to the bbox") {
    import SparkTestSession._
    val dir = java.nio.file.Files.createTempDirectory("graft_catalog").toString
    val cat = grid.TileCatalog.generate(spark)
    grid.TileCatalog.writeCsv(cat, dir)
    val back = grid.TileCatalog.readCsv(spark, dir)
    assert(back.collect().toSet == cat.collect().toSet)
    // a bbox spanning tile (5,5)'s center to tile (6,6)'s center
    // intersects exactly the 2x2 block
    val t55 = cat.filter(r => r.h == 5 && r.v == 5).head()
    val (cx, cy) = (t55.ulx + 75000.0, t55.uly - 75000.0)
    val cov = grid.TileCatalog.covering(back,
      cx, cy - 150000.0, cx + 150000.0, cy).collect()
    assert(cov.length == 4, s"expected 2x2 tiles, got ${cov.length}")
    assert(cov.map(r => (r.h, r.v)).toSet == Set((5, 5), (5, 6), (6, 5), (6, 6)))
  }
}
