package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force completeness check of the two-tier EdgeIndex: every edge
  * whose coordinate range overlaps the query interval must be visited.
  *
  * Regression guard: the round-1 packing biased minX by -Int.MinValue
  * before shifting into the sort key, overflowing the long's sign bit —
  * arrays mixing negative and non-negative coordinates sorted
  * [mn>=0..., mn<0...] and range scans could stop before the negative
  * block, silently missing edges for any geometry that straddles
  * coordinate zero (Greenwich / the equator in web-mercator ints).
  */
class EdgeIndexCheck extends AnyFunSuite {

  test("forRange visits every overlapping edge (incl. zero-straddling " +
      "rings and long-edge tails)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 300) {
      val n = 3 + rnd.nextInt(60)
      val xs = Array.fill(n)(rnd.nextInt(2000) - 1000)
      val ys = Array.fill(n)(rnd.nextInt(2000) - 1000)
      val coords = new Array[Int](2 * (n + 1))
      for (i <- 0 until n) { coords(2 * i) = xs(i); coords(2 * i + 1) = ys(i) }
      coords(2 * n) = xs(0); coords(2 * n + 1) = ys(0)
      // every third ring gets one very long edge (exercises the long tier)
      if (trial % 3 == 0) coords(2) = coords(2) + 500000
      val g = new Geo.G(2, coords, Array(n + 1))
      val idx = g.edgeIndex
      for (_ <- 0 until 50) {
        val lo = rnd.nextInt(1200000) - 600000
        val hi = lo + rnd.nextInt(3000)
        val got = scala.collection.mutable.Set[Int]()
        idx.forRange(lo, hi)(got += _)
        for (e <- 0 until g.edgeCount) {
          val i = g.edgeP(e); val j = g.edgeQ(e)
          val mn = math.min(g.x(i), g.x(j)); val mx = math.max(g.x(i), g.x(j))
          assert(!(mx >= lo && mn <= hi && !got(e)),
            s"missed edge trial=$trial e=$e lo=$lo hi=$hi mn=$mn mx=$mx")
        }
      }
    }
  }
}
