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
    * the midpoint of the closest pair (legacy; see [[metersPair]] for the
    * reference-exact rule). */
  def meters(eucl: Double, y1: Double, y2: Double): Double =
    eucl / PREC * distFactor(((y1 + y2) / 2.0) / PREC)

  /** Reference-exact meter distance between the two closest points
    * (reference Sweeper::meterDist, src/spatialjoin/Sweeper.cpp:4015-4021:
    * int points are divided by PREC and cast to FLOAT, then the util
    * webMercMeterDist converts the euclidean distance with the scale factor
    * cos((latA+latB)/2) — the MEAN of the two point latitudes, each
    * lat = 2*atan(exp(y/6378137)) - pi/2). */
  def metersPair(px: Double, py: Double, qx: Double, qy: Double): Double = {
    val ax = (px.toInt / PREC).toFloat; val ay = (py.toInt / PREC).toFloat
    val bx = (qx.toInt / PREC).toFloat; val by = (qy.toInt / PREC).toFloat
    val dx = ax.toDouble - bx.toDouble; val dy = ay.toDouble - by.toDouble
    val d = math.sqrt(dx * dx + dy * dy)
    val latA = 2 * math.atan(math.exp(ay.toDouble / 6378137.0)) - 1.5707965
    val latB = 2 * math.atan(math.exp(by.toDouble / 6378137.0)) - 1.5707965
    d * math.cos((latA + latB) / 2.0)
  }

  /** Same scale rule on exact double points (closest-pair interior
    * projections for line/area geometries, where the reference's snapping
    * behavior lives in the absent util submodule — kept exact here). */
  def metersPairD(px: Double, py: Double, qx: Double, qy: Double): Double = {
    val dx = px - qx; val dy = py - qy
    val d = math.sqrt(dx * dx + dy * dy) / PREC
    val latA = 2 * math.atan(math.exp(py / PREC / 6378137.0)) - 1.5707965
    val latB = 2 * math.atan(math.exp(qy / PREC / 6378137.0)) - 1.5707965
    d * math.cos((latA + latB) / 2.0)
  }

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

  /** Closest approach between two segments: (dist2, px, py, qx, qy) — the
    * two closest points. Non-intersecting segments: the minimum over the
    * four point-to-segment distances is exact. */
  def segSegClosest(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, dx: Double, dy: Double)
      : (Double, Double, Double, Double, Double) = {
    def ps(px: Double, py: Double, sx: Double, sy: Double, tx: Double,
        ty: Double): (Double, Double, Double, Double, Double) = {
      val ddx = tx - sx; val ddy = ty - sy
      val len2 = ddx * ddx + ddy * ddy
      val t =
        if (len2 <= 0) 0.0
        else math.max(0.0, math.min(1.0, ((px - sx) * ddx + (py - sy) * ddy) / len2))
      val qx = sx + t * ddx; val qy = sy + t * ddy
      val vx = px - qx; val vy = py - qy
      (vx * vx + vy * vy, px, py, qx, qy)
    }
    var best = ps(ax, ay, cx, cy, dx, dy)
    val c2 = ps(bx, by, cx, cy, dx, dy); if (c2._1 < best._1) best = c2
    val c3 = ps(cx, cy, ax, ay, bx, by); if (c3._1 < best._1) best = c3
    val c4 = ps(dx, dy, ax, ay, bx, by); if (c4._1 < best._1) best = c4
    best
  }

  /** Min meter distance between two single geometries; 0 if intersecting.
    * Prunes segment pairs via the x-sorted edge index and the running best
    * (role of the reference's maxEuclideanDist pruning in util withinDist,
    * used at src/spatialjoin/Sweeper.cpp:4040-4043). */
  def geomDist(a: G, b: G): Double = {
    // point/point fast path: no relate, no edge machinery
    if (a.kind == 0 && b.kind == 0) {
      val px = a.x(0); val py = a.y(0); val qx = b.x(0); val qy = b.y(0)
      if (px == qx && py == qy) return 0.0
      return metersPair(px, py, qx, qy)
    }
    // intersection => 0 (cheap: use predicates)
    if (a.bboxIntersects(b) && Relate.relate(a, b).isect) return 0.0

    var bestD2 = Double.MaxValue
    var bPx = 0.0; var bPy = 0.0; var bQx = 0.0; var bQy = 0.0

    // quick seed: bbox-corner distance upper bound via closest vertices of
    // the first segments — just start from +inf and prune with x-distance.
    val (outer, inner) = if (a.edgeCount >= b.edgeCount) (a, b) else (b, a)

    def segOf(g: G, e: Int): (Int, Int, Int, Int) =
      if (g.kind == 0) (g.x(0), g.y(0), g.x(0), g.y(0))
      else {
        val i = g.edgeP(e); val j = g.edgeQ(e)
        (g.x(i), g.y(i), g.x(j), g.y(j))
      }

    val nOut = math.max(1, outer.edgeCount)
    var e = 0
    while (e < nOut) {
      val (ax, ay, bx, by) = segOf(outer, e)
      val sMinX = math.min(ax, bx); val sMaxX = math.max(ax, bx)
      val sMinY = math.min(ay, by); val sMaxY = math.max(ay, by)
      // x-gap lower bound vs inner bbox
      val xGap = math.max(0, math.max(inner.minX - sMaxX, sMinX - inner.maxX))
        .toDouble
      val yGap = math.max(0, math.max(inner.minY - sMaxY, sMinY - inner.maxY))
        .toDouble
      if (xGap * xGap + yGap * yGap < bestD2) {
        val best = math.sqrt(bestD2)
        val reach = if (best > Int.MaxValue.toDouble) Int.MaxValue
          else best.toInt + 1
        if (inner.kind == 0) {
          val (cx, cy, dx0, dy0) = segOf(inner, 0)
          val (d2, p1, p2, q1, q2) = segSegClosest(ax, ay, bx, by, cx, cy, dx0, dy0)
          if (d2 < bestD2) { bestD2 = d2; bPx = p1; bPy = p2; bQx = q1; bQy = q2 }
        } else {
          inner.edgeIndex.forRange(
            (sMinX.toLong - reach).max(Int.MinValue).toInt,
            (sMaxX.toLong + reach).min(Int.MaxValue).toInt) { e2 =>
            val i2 = inner.edgeP(e2); val j2 = inner.edgeQ(e2)
            val cx = inner.x(i2); val cy = inner.y(i2)
            val dx0 = inner.x(j2); val dy0 = inner.y(j2)
            val yLo = math.min(cy, dy0); val yHi = math.max(cy, dy0)
            val yg = math.max(0, math.max(yLo - sMaxY, sMinY - yHi)).toDouble
            if (yg * yg < bestD2) {
              val (d2, p1, p2, q1, q2) =
                segSegClosest(ax, ay, bx, by, cx, cy, dx0, dy0)
              if (d2 < bestD2) { bestD2 = d2; bPx = p1; bPy = p2; bQx = q1; bQy = q2 }
            }
          }
        }
      }
      e += 1
    }
    if (bestD2 == Double.MaxValue) Double.MaxValue
    else metersPairD(bPx, bPy, bQx, bQy)
  }
}
