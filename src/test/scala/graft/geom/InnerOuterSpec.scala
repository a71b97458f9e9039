package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** P7 inner/outer simplification (reference InnerOuter.h:12-199): the
  * INNER form must be a subset of the polygon's region and the OUTER form
  * a superset — that soundness is what makes the Sweeper.cpp:1613-1651
  * pre-checks result-invariant. One-sided DP compresses one-sided detail:
  * inward dents vanish under OUTER (grow), outward bumps under INNER
  * (shrink); whenever a form exists at all it must sit on the correct side.
  */
class InnerOuterSpec extends AnyFunSuite {

  /** Square of side L at (0,0) with sawtooth teeth of height `tooth` on
    * every edge; tooth > 0 points OUT of the region, < 0 dents INTO it.
    * CCW orientation. ~8 points per tooth period, `teeth` periods/edge. */
  private def sawSquare(l: Int, tooth: Int, teeth: Int): Array[Int] = {
    val pts = new scala.collection.mutable.ArrayBuffer[Int]()
    // edge from (x0,y0) to (x1,y1) with outward normal (nx,ny)
    def edge(x0: Int, y0: Int, x1: Int, y1: Int, nx: Int, ny: Int): Unit = {
      val n = teeth * 4
      for (i <- 0 until n) {
        val bx = x0 + (x1 - x0).toLong * i / n
        val by = y0 + (y1 - y0).toLong * i / n
        val phase = i % 4
        val h = if (phase == 1 || phase == 2) tooth else 0
        pts += (bx + nx.toLong * h).toInt += (by + ny.toLong * h).toInt
      }
    }
    edge(0, 0, l, 0, 0, -1)  // bottom, outward = -y
    edge(l, 0, l, l, 1, 0)   // right
    edge(l, l, 0, l, 0, 1)   // top
    edge(0, l, 0, 0, -1, 0)  // left
    pts.toArray
  }

  private def grid(g: Geo.G, a: Geo.G, b: Geo.G): Int = {
    // count sample points strictly inside a but strictly outside b
    val step = math.max(1, (g.maxX - g.minX) / 41)
    var violations = 0
    var x = g.minX - step
    while (x <= g.maxX + step) {
      var y = g.minY - step
      while (y <= g.maxY + step) {
        if (Geo.locate(x, y, a) == Geo.IN && Geo.locate(x, y, b) == Geo.OUT)
          violations += 1
        y += step
      }
      x += step
    }
    violations
  }

  test("OUTER fills inward dents; INNER form stays a subset") {
    val g = new Geo.G(2, sawSquare(100000, -1500, 20), Array(320))
    val outer = InnerOuter.simplified(g, grow = true)
    assert(outer != null, "dents within eps must simplify under OUTER")
    assert(outer.nPoints <= 16)
    assert(grid(g, g, outer) == 0, "outer must be a superset")
    assert(outer.area2 >= g.area2)
    // INNER may legally collapse each edge to the dent plateau — if a form
    // comes back it must be a genuine subset
    val inner = InnerOuter.simplified(g, grow = false)
    if (inner != null) {
      assert(grid(g, inner, g) == 0, "inner must be a subset")
      assert(inner.area2 <= g.area2)
    }
  }

  test("INNER cuts outward bumps; OUTER form stays a superset") {
    val g = new Geo.G(2, sawSquare(100000, 1500, 20), Array(320))
    val inner = InnerOuter.simplified(g, grow = false)
    assert(inner != null, "bumps within eps must simplify under INNER")
    assert(inner.nPoints <= 16)
    assert(grid(g, inner, g) == 0, "inner must be a subset")
    assert(inner.area2 <= g.area2)
    // OUTER may legally lift each edge to the bump plateau — if a form
    // comes back it must be a genuine superset
    val outer = InnerOuter.simplified(g, grow = true)
    if (outer != null) {
      assert(grid(g, g, outer) == 0, "outer must be a superset")
      assert(outer.area2 >= g.area2)
    }
  }

  test("holes move the opposite way: OUTER shrinks a toothed hole") {
    // plain square outer ring (CCW) + hole whose teeth protrude out of the
    // hole into the polygon material (hole ring CW = reversed CCW saw)
    val outerRing = Array(0, 0, 300000, 0, 300000, 300000, 0, 300000)
    val holeSaw = sawSquare(100000, 3000, 20) // teeth point out of the hole
      .grouped(2).toArray.reverse.flatten     // reverse -> CW hole
      .map(_ + 100000)                        // hole sits at (100000,100000)
    val coords = outerRing ++ holeSaw
    val g = new Geo.G(2, coords, Array(4, 4 + holeSaw.length / 2))
    val outer = InnerOuter.simplified(g, grow = true)
    assert(outer != null, "hole teeth within eps must shrink under OUTER")
    assert(grid(g, g, outer) == 0, "outer with shrunk hole must be superset")
    assert(outer.area2 >= g.area2)
    // INNER grows the hole (a grown hole shrinks the polygon): if a form
    // comes back it must be a genuine subset
    val inner = InnerOuter.simplified(g, grow = false)
    if (inner != null) {
      assert(grid(g, inner, g) == 0, "inner with grown hole must be subset")
      assert(inner.area2 <= g.area2)
    }
  }

  test("small or incompressible rings yield no form (MIN_GAIN)") {
    val g = new Geo.G(2,
      Array(0, 100, 100, 0, 0, -100, -100, 0), Array(4))
    assert(InnerOuter.simplified(g, grow = false) == null)
    assert(InnerOuter.simplified(g, grow = true) == null)
  }

  test("collinear-heavy ring simplifies exactly in both modes") {
    // square with 25 collinear points per edge: both forms keep only the
    // corners (plus at most the fixed DP split anchors); region unchanged
    val pts = new scala.collection.mutable.ArrayBuffer[Int]()
    def edge(x0: Int, y0: Int, x1: Int, y1: Int): Unit =
      for (i <- 0 until 25)
        pts += x0 + (x1 - x0) * i / 25 += y0 + (y1 - y0) * i / 25
    edge(0, 0, 1000, 0); edge(1000, 0, 1000, 1000)
    edge(1000, 1000, 0, 1000); edge(0, 1000, 0, 0)
    val g = new Geo.G(2, pts.toArray, Array(100))
    for (grow <- Seq(true, false)) {
      val s = InnerOuter.simplified(g, grow)
      assert(s != null)
      assert(s.nPoints <= 8)
      assert(s.area2 == g.area2)
    }
  }
}
