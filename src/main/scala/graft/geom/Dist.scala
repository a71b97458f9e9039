package graft.geom

import Geo._

/** Meter distances on int web-mercator coordinates with local scale
  * correction (reference: src/spatialjoin/Sweeper.cpp:3997-4021,
  * web-mercator distortion factor = cos(latitude)).
  */
object Dist {

  /** cos(lat) at a projected (un-PREC'd) mercator y. */
  def distFactor(yMerc: Double): Double = {
    val lat = math.atan(math.exp(yMerc * math.Pi / MERC_HALF)) * 2 - math.Pi / 2
    math.cos(lat)
  }

  /** Euclidean int-space distance converted to meters using the factor at
    * the midpoint of the closest pair (reference meterDist semantics). */
  def meters(eucl: Double, y1: Double, y2: Double): Double =
    eucl / PREC * distFactor(((y1 + y2) / 2.0) / PREC)

  /** Squared euclid distance point->segment in double (int inputs). */
  def pointSegDist2(px: Double, py: Double, ax: Double, ay: Double,
      bx: Double, by: Double): Double = {
    val dx = bx - ax; val dy = by - ay
    val len2 = dx * dx + dy * dy
    val t =
      if (len2 <= 0) 0.0
      else math.max(0.0, math.min(1.0, ((px - ax) * dx + (py - ay) * dy) / len2))
    val cx = ax + t * dx; val cy = ay + t * dy
    val ddx = px - cx; val ddy = py - cy
    ddx * ddx + ddy * ddy
  }

  /** Closest approach between two segments: (dist2, midYOfClosestPair). */
  def segSegClosest(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, dx: Double, dy: Double): (Double, Double) = {
    // if they properly intersect, distance 0
    // check via the four point-seg distances otherwise (sufficient for
    // non-intersecting segments)
    def ps(px: Double, py: Double, sx: Double, sy: Double, tx: Double,
        ty: Double): (Double, Double) = {
      val ddx = tx - sx; val ddy = ty - sy
      val len2 = ddx * ddx + ddy * ddy
      val t =
        if (len2 <= 0) 0.0
        else math.max(0.0, math.min(1.0, ((px - sx) * ddx + (py - sy) * ddy) / len2))
      val qx = sx + t * ddx; val qy = sy + t * ddy
      val vx = px - qx; val vy = py - qy
      (vx * vx + vy * vy, (py + qy) / 2.0)
    }
    var best = ps(ax, ay, cx, cy, dx, dy)
    val c2 = ps(bx, by, cx, cy, dx, dy); if (c2._1 < best._1) best = c2
    val c3 = ps(cx, cy, ax, ay, bx, by); if (c3._1 < best._1) best = c3
    val c4 = ps(dx, dy, ax, ay, bx, by); if (c4._1 < best._1) best = c4
    best
  }

  /** Min meter distance between two single geometries; 0 if intersecting.
    * `maxMeters < 0` means unbounded. */
  def geomDist(a: G, b: G): Double = {
    // intersection => 0 (cheap: use predicates)
    if (a.bboxIntersects(b) && Relate.relate(a, b).isect) return 0.0

    var bestD2 = Double.MaxValue
    var bestMidY = 0.0

    def segsOf(g: G): Iterator[(Int, Int, Int, Int)] =
      if (g.kind == 0) Iterator((g.x(0), g.y(0), g.x(0), g.y(0)))
      else (0 until g.edgeCount).iterator.map { e =>
        val i = g.edgeP(e); val j = g.edgeQ(e)
        (g.x(i), g.y(i), g.x(j), g.y(j))
      }

    // point-in-polygon: a point/line/poly could be strictly inside the other
    // polygon without touching boundary (distance 0 handled by isect above;
    // disjoint interiors guaranteed here)
    for ((ax, ay, bx, by) <- segsOf(a); (cx, cy, dx0, dy0) <- segsOf(b)) {
      val (d2, midY) = segSegClosest(ax, ay, bx, by, cx, cy, dx0, dy0)
      if (d2 < bestD2) { bestD2 = d2; bestMidY = midY }
    }
    if (bestD2 == Double.MaxValue) Double.MaxValue
    else math.sqrt(bestD2) / PREC * distFactor(bestMidY / PREC)
  }
}
