package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Kernel checks derived from the reference README walkthrough geometries
  * (reference: example.txt, README.md "Usage") plus targeted degenerate
  * cases. Pure-kernel; the full fixture parity suite drives the Spark
  * pipeline separately.
  */
class RelateSpec extends AnyFunSuite {

  private val example = Seq(
    "POLYGON((0 0, 10  0 ,10 10, 0 10, 0 0))",
    "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (1 1, 9 1, 9 9, 1 9, 1 1))",
    "MULTIPOLYGON(((0 0, 10 0, 10 10, 0 10, 0 0), (1 1, 9 1, 9 9, 1 9, 1 1)))",
    "POLYGON((4 4, 5 4, 5 5, 4 5, 4 4))",
    "POLYGON((4 4, 5 4, 5 11, 4 11, 4 4))",
    "LINESTRING(1 1, 1 2)",
    "LINESTRING(0.5 1.5, 1.5 1.5)",
    "LINESTRING(-10 1, 100 1)",
    "POINT(0.5 0.5)")

  private val g: Map[Int, Geo.G] =
    example.zipWithIndex.map { case (w, i) =>
      val subs = Wkt.parseWkt(w)
      assert(subs.length == 1, s"geometry ${i + 1} decomposed to ${subs.length}")
      (i + 1) -> subs.head
    }.toMap

  private def rel(a: Int, b: Int) = Relate.relate(g(a), g(b))

  test("polygon contains point (1 contains 9)") {
    val r = rel(1, 9)
    assert(r.isect && r.bCovByA && r.bContInA && !r.touches)
  }

  test("point in hole is outside (2 vs 9 disjoint? no - 9 at 0.5,0.5 is between shell and hole)") {
    // (0.5,0.5) is inside shell, outside the 1..9 hole => interior of 2
    val r = rel(2, 9)
    assert(r.isect && r.bCovByA && r.bContInA)
  }

  test("small square inside the hole is disjoint from the holed polygon (2 vs 4)") {
    val r = rel(2, 4)
    assert(!r.isect)
  }

  test("identical polygons equal (2 vs 3)") {
    val r = rel(2, 3)
    assert(r.isect && r.aCovByB && r.bCovByA && !r.touches && !r.overlaps)
    assert(g(2).area2 == g(3).area2)
  }

  test("covered sharing boundary: covers and OGC contains (1 vs 2)") {
    val r12 = rel(1, 2)
    assert(r12.bCovByA, "1 covers 2") // 2 is subset of 1
    assert(r12.bContInA, "OGC contains: interiors intersect")
    assert(!r12.aCovByB, "2 does not cover 1")
    assert(!r12.touches)
  }

  test("partial overlap (1 vs 5)") {
    val r = rel(1, 5)
    assert(r.isect && r.overlaps && !r.aCovByB && !r.bCovByA && !r.touches)
  }

  test("square inside polygon touching from inside (5 covers 4, no touch)") {
    val r = rel(5, 4)
    assert(r.isect && r.bCovByA && r.bContInA && !r.touches && !r.overlaps)
  }

  test("line on hole boundary touches holed polygon (2 vs 6)") {
    val r = rel(2, 6)
    assert(r.isect)
    assert(r.bCovByA, "2 covers 6 (boundary is in the closure)")
    assert(!r.bContInA)
    assert(r.touches, "interiors disjoint, contact on boundary")
  }

  test("line strictly inside (1 contains 6)") {
    val r = rel(1, 6)
    assert(r.isect && r.bCovByA && r.bContInA && !r.touches)
  }

  test("line crosses holed polygon boundary (7 vs 2)") {
    val r = rel(2, 7)
    assert(r.isect && r.crosses && !r.touches && !r.aCovByB && !r.bCovByA)
  }

  test("line crosses line (6 vs 7)") {
    val r = rel(6, 7)
    assert(r.isect && r.crosses && !r.touches && !r.overlaps)
  }

  test("long line crosses big polygon (1 vs 8)") {
    val r = rel(1, 8)
    assert(r.isect && r.crosses)
  }

  test("line 8 crosses holed polygon 2 with collinear run on hole edge") {
    val r = rel(2, 8)
    assert(r.isect && r.crosses)
  }

  // note: mercator projection is nonlinear in latitude, so diagonal lon/lat
  // collinearity does NOT survive projection — use constant-lat/lon lines.
  test("collinear overlapping lines overlap (partial)") {
    val a = Wkt.parseWkt("LINESTRING(0 0, 2 0)").head
    val b = Wkt.parseWkt("LINESTRING(1 0, 3 0)").head
    val r = Relate.relate(a, b)
    assert(r.isect && r.overlaps && !r.crosses && !r.touches)
  }

  test("line covered by longer line") {
    val a = Wkt.parseWkt("LINESTRING(1 1, 1 2)").head
    val b = Wkt.parseWkt("LINESTRING(1 0, 1 3)").head
    val r = Relate.relate(a, b)
    assert(r.aCovByB && !r.bCovByA && !r.touches && !r.crosses && !r.overlaps)
  }

  test("lines touching at endpoints") {
    val a = Wkt.parseWkt("LINESTRING(0 0, 1 1)").head
    val b = Wkt.parseWkt("LINESTRING(1 1, 2 0)").head
    val r = Relate.relate(a, b)
    assert(r.isect && r.touches && !r.crosses && !r.overlaps)
  }

  test("endpoint touching line interior") {
    val a = Wkt.parseWkt("LINESTRING(0 0, 2 0)").head
    val b = Wkt.parseWkt("LINESTRING(1 0, 1 5)").head
    val r = Relate.relate(a, b)
    assert(r.isect && r.touches && !r.crosses)
  }

  test("point on polygon boundary: covers not contains, touches") {
    val p = Wkt.parseWkt("POINT(0 5)").head
    val r = Relate.relate(g(1), p)
    assert(r.isect && r.bCovByA && !r.bContInA && r.touches)
  }

  test("point on line endpoint touches") {
    val p = Wkt.parseWkt("POINT(1 1)").head
    val l = Wkt.parseWkt("LINESTRING(1 1, 1 2)").head
    val r = Relate.relate(p, l)
    assert(r.isect && r.aCovByB && !r.aContInB && r.touches)
  }

  test("point on line interior: contains") {
    val p = Wkt.parseWkt("POINT(1 1.5)").head
    val l = Wkt.parseWkt("LINESTRING(1 1, 1 2)").head
    val r = Relate.relate(p, l)
    assert(r.isect && r.aCovByB && r.aContInB && !r.touches)
  }

  test("degenerate zero-area polygon has empty interior") {
    // constant latitude keeps the sliver degenerate after projection
    val d = Wkt.parseWkt("POLYGON((1 0, 2 0, 3 0, 1 0))").head
    assert(d.area2 == 0L)
    val tri = Wkt.parseWkt("POLYGON((20 20, 25 20, 25 25, 20 20))").head
    val r = Relate.relate(d, tri)
    assert(!r.isect)
  }

  test("touching polygons share an edge") {
    val a = Wkt.parseWkt("POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))").head
    val b = Wkt.parseWkt("POLYGON((1 0, 2 0, 2 1, 1 1, 1 0))").head
    val r = Relate.relate(a, b)
    assert(r.isect && r.touches && !r.overlaps && !r.aCovByB && !r.bCovByA)
  }

  test("polygons touching at a corner") {
    val a = Wkt.parseWkt("POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))").head
    val b = Wkt.parseWkt("POLYGON((1 1, 2 1, 2 2, 1 2, 1 1))").head
    val r = Relate.relate(a, b)
    assert(r.isect && r.touches && !r.overlaps)
  }

  test("tangential pass-through is not a touch (vertex on edge, crossing)") {
    // diamond poking through the square's right edge at a vertex
    val a = Wkt.parseWkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))").head
    val b = Wkt.parseWkt("POLYGON((3 2, 5 1, 5 3, 3 2))").head
    // b's vertex (3,2) is inside a; b crosses a's edge x=4
    val r = Relate.relate(a, b)
    assert(r.isect && r.overlaps && !r.touches)
  }

  test("vertex-touch from outside stays a touch") {
    val a = Wkt.parseWkt("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))").head
    val b = Wkt.parseWkt("POLYGON((4 2, 6 1, 6 3, 4 2))").head
    val r = Relate.relate(a, b)
    assert(r.isect && r.touches && !r.overlaps)
  }

  test("DE-9IM equal polygons") {
    assert(Relate.matToString(Relate.de9im(g(2), g(3))) == "2FFF1FFF2")
  }

  test("DE-9IM contained with boundary contact (1 covers 2)") {
    // 2 subset of 1, sharing the outer shell boundary
    val m = Relate.matToString(Relate.de9im(g(1), g(2)))
    assert(m(0) == '2', s"II in $m")
    assert(m(8) == '2')
  }

  test("DE-9IM crossing lines") {
    assert(Relate.matToString(Relate.de9im(g(6), g(7))) == "0F1FF0102")
  }

  test("DE-9IM point in polygon both directions") {
    assert(Relate.matToString(Relate.de9im(g(9), g(1))) == "0FFFFF212")
    assert(Relate.matToString(Relate.de9im(g(1), g(9))) == "0F2FF1FF2")
  }

  test("distance of touching geometries is 0") {
    val a = Wkt.parseWkt("POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))").head
    val b = Wkt.parseWkt("POLYGON((1 0, 2 0, 2 1, 1 1, 1 0))").head
    assert(Dist.geomDist(a, b) == 0.0)
  }

  test("distance positive for separated points, roughly correct") {
    // ~1 degree of longitude at equator is ~111.3 km
    val a = Wkt.parseWkt("POINT(0 0)").head
    val b = Wkt.parseWkt("POINT(1 0)").head
    val d = Dist.geomDist(a, b)
    assert(math.abs(d - 111319.5) < 200.0, s"d=$d")
  }

  test("oriented box contains all vertices and is tighter than the bbox") {
    // a thin diagonal strip: 150 points along y = x with small jitter
    val n = 150
    val cs = new Array[Int](2 * n)
    for (i <- 0 until n) {
      cs(2 * i) = i * 1000 + (i % 7) * 3
      cs(2 * i + 1) = i * 1000 + 200 + (i % 5) * 4
    }
    val line = Geo.G.line(cs)
    val obb = Geo.orientedBox(line, 10.0)
    assert(obb != null && obb.nPoints == 4)
    for (i <- 0 until n)
      assert(Geo.locate(line.x(i), line.y(i), obb) != Geo.OUT, s"vertex $i")
    // min-area box of a diagonal strip is far smaller than the aligned bbox
    val bboxArea = (line.maxX - line.minX).toDouble * (line.maxY - line.minY)
    assert(math.abs(obb.area2 / 2.0) < bboxArea / 10.0)
  }
}
