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

  test("snap returns the grid origin for the origin cell") {
    assert(Grid.snap(Grid.tile.tx, Grid.tile.ty, Grid.tile) ==
      ((Grid.tile.tx, Grid.tile.ty)))
    assert(Grid.gridPt(Grid.tile.tx, Grid.tile.ty, Grid.tile) == ((0, 0)))
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
}
