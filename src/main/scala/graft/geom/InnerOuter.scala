package graft.geom

/** P7: inner/outer polygon simplification (reference InnerOuter.h:12-199).
  *
  * One-sided Douglas-Peucker over each ring: a chord may replace a chain of
  * vertices only when every dropped vertex lies on ONE designated side of
  * the chord (within eps) and none on the other — so the simplified ring's
  * enclosed region is a guaranteed superset ("grow") or subset ("shrink")
  * of the original's. A polygon's OUTER form (superset: grown outer ring,
  * shrunk holes) gives a sound intersects-reject pre-check; its INNER form
  * (subset) gives a sound contains-accept shortcut
  * (reference Sweeper.cpp:1613-1651).
  *
  * The drop side is derived from each ring's own orientation (signed
  * shoelace area) rather than a fixed winding convention, so the
  * superset/subset invariant holds for any input orientation.
  */
object InnerOuter {

  /** Reference InnerOuter.h:14 — simplification must remove >80% of points
    * to be worth storing. */
  final val MIN_GAIN = 0.20

  /** Reference Sweeper.cpp:292-295 — eps = 2*pi*r_equiv * factor with
    * r_equiv the equal-area circle radius of the ring. */
  final val DEFAULT_FACTOR = 1.0 / (3.14 * 20)

  /** Signed perpendicular distance of C from line AB: >0 iff C lies to the
    * left of travel A->B (reference InnerOuter.h:17-34, sign flipped to the
    * conventional cross(AB,AC) orientation — only relative sides matter). */
  private def signedDist(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double): Double = {
    val dx = bx - ax; val dy = by - ay
    val len = math.sqrt(dx * dx + dy * dy)
    if (len == 0) 0.0
    else (dx * (cy - ay) - dy * (cx - ax)) / len
  }

  /** One-sided DP on points l..r (inclusive) of (xs, ys), appending kept
    * point indices to out. Points whose signed distance has sign
    * `dropSign` may be dropped when within eps; any point on the opposite
    * side forces a recursive split there
    * (reference innerOuterDouglasPeucker, InnerOuter.h:37-129). */
  private def dp(xs: Array[Int], ys: Array[Int], l: Int, r: Int, eps: Double,
      dropSign: Int, out: java.util.ArrayList[Int]): Unit = {
    if (l == r) { out.add(l); return }
    if (l + 1 == r) { out.add(l); out.add(r); return }
    val ax = xs(l).toDouble; val ay = ys(l).toDouble
    val bx = xs(r).toDouble; val by = ys(r).toDouble
    if (ax == bx && ay == by) {
      // degenerate chord: keep the chain verbatim
      var k = l
      while (k <= r) { out.add(k); k += 1 }
      return
    }
    var mDrop = l; var maxDrop = 0.0
    var mKeep = l; var maxKeep = 0.0
    var k = l + 1
    while (k < r) {
      val d = signedDist(ax, ay, bx, by, xs(k).toDouble, ys(k).toDouble)
      val onDrop = if (dropSign > 0) d > 0 else d < 0
      val m = math.abs(d)
      if (onDrop) { if (m > maxDrop) { maxDrop = m; mDrop = k } }
      else if (m > 0) { if (m > maxKeep) { maxKeep = m; mKeep = k } }
      k += 1
    }
    if (maxKeep == 0 && maxDrop <= eps) { out.add(l); out.add(r); return }
    val m = if (maxKeep > 0) mKeep else mDrop
    dp(xs, ys, l, m, eps, dropSign, out)
    dp(xs, ys, m + 1, r, eps, dropSign, out)
  }

  /** Simplify one ring (open point list). grow=true → enclosed region of
    * the result is a superset of the original ring's region; grow=false →
    * subset. Returns kept indices, or null when the result degenerates
    * (<3 points). */
  private def simplifyRing(xs: Array[Int], ys: Array[Int], eps: Double,
      grow: Boolean): java.util.ArrayList[Int] = {
    val n = xs.length
    // ring orientation: interior of the enclosed region is LEFT of travel
    // iff the shoelace sum is positive (CCW)
    var acc = 0L
    var i = 0
    while (i < n) {
      val j = if (i + 1 == n) 0 else i + 1
      acc += xs(i).toLong * ys(j) - xs(j).toLong * ys(i)
      i += 1
    }
    if (acc == 0) return null
    val interiorSign = if (acc > 0) 1 else -1
    // grow = fill notches (drop interior-side points); shrink = cut bumps
    val dropSign = if (grow) interiorSign else -interiorSign
    val out = new java.util.ArrayList[Int](16)
    // split as the reference does (InnerOuter.h:158-183): the two half-open
    // chains anchored at vertex 0, m, and n-1
    val m = n / 2
    dp(xs, ys, 0, m, eps, dropSign, out)
    dp(xs, ys, m + 1, n - 1, eps, dropSign, out)
    // adjacent halves may duplicate the shared anchors; dedup consecutive
    var w = 0
    var last = -1
    i = 0
    while (i < out.size) {
      val v = out.get(i)
      if (v != last) { out.set(w, v); w += 1; last = v }
      i += 1
    }
    while (out.size > w) out.remove(out.size - 1)
    if (out.size < 3) null else out
  }

  /** Simplified polygon of g: region is a superset of g's when grow=true
    * (reference Mode::OUTER) or a subset when grow=false (Mode::INNER).
    * Returns null when not worthwhile (reference MIN_GAIN,
    * InnerOuter.h:189-193) or when any ring degenerates. */
  def simplified(g: Geo.G, grow: Boolean,
      factor: Double = DEFAULT_FACTOR): Geo.G = {
    if (g.kind != 2) return null
    var oldPts = 0
    var newPts = 0
    val coords = new java.util.ArrayList[Int](64)
    val ends = new java.util.ArrayList[Int](4)
    var r = 0
    while (r < g.nRings) {
      val s = g.ringStart(r); val e = g.ringEnds(r)
      val n = e - s
      oldPts += n
      if (n < 4) {
        // too small to simplify: keep verbatim (reference InnerOuter.h:145,170)
        var i = s
        while (i < e) { coords.add(g.x(i)); coords.add(g.y(i)); i += 1 }
        newPts += n
      } else {
        val xs = new Array[Int](n); val ys = new Array[Int](n)
        var i = 0
        while (i < n) { xs(i) = g.x(s + i); ys(i) = g.y(s + i); i += 1 }
        // ring area -> eps (reference Sweeper.cpp:292: 2*pi*r_equiv*factor)
        var acc = 0L
        i = 0
        while (i < n) {
          val j = if (i + 1 == n) 0 else i + 1
          acc += xs(i).toLong * ys(j) - xs(j).toLong * ys(i)
          i += 1
        }
        val ringArea = math.abs(acc) / 2.0
        val eps = math.sqrt(ringArea / 3.14) * 3.14 * 2 * factor
        // outer ring follows the polygon's mode; each hole's own region
        // moves the OPPOSITE way (shrinking a hole grows the polygon)
        val ringGrow = if (r == 0) grow else !grow
        val kept = simplifyRing(xs, ys, eps, ringGrow)
        if (kept == null) return null
        i = 0
        while (i < kept.size) {
          val k = kept.get(i)
          coords.add(xs(k)); coords.add(ys(k))
          i += 1
        }
        newPts += kept.size
      }
      ends.add(coords.size / 2)
      r += 1
    }
    if (newPts.toDouble / oldPts > MIN_GAIN) return null
    val ca = new Array[Int](coords.size)
    var i = 0
    while (i < ca.length) { ca(i) = coords.get(i); i += 1 }
    val ea = new Array[Int](ends.size)
    i = 0
    while (i < ea.length) { ea(i) = ends.get(i); i += 1 }
    new Geo.G(2, ca, ea)
  }
}
