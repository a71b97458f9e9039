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

  /** Running closest-pair accumulator over segment pairs (monomorphic
    * visit, no per-pair tuples — this is the innermost distance-mode loop). */
  private final class DistScan(inner: G) {
    private val cs = inner.coords
    private val nx = if (inner.kind == 0) null else inner.nextIdx
    var bestD2 = Double.MaxValue
    var bPx = 0.0; var bPy = 0.0; var bQx = 0.0; var bQy = 0.0
    // current outer segment
    var ax = 0.0; var ay = 0.0; var bx = 0.0; var by = 0.0
    var sMinY = 0; var sMaxY = 0

    /** point p vs segment [s,t]; updates best fields. */
    private def ps(px: Double, py: Double, sx: Double, sy: Double,
        tx: Double, ty: Double): Unit = {
      val ddx = tx - sx; val ddy = ty - sy
      val len2 = ddx * ddx + ddy * ddy
      val t =
        if (len2 <= 0) 0.0
        else math.max(0.0, math.min(1.0, ((px - sx) * ddx + (py - sy) * ddy) / len2))
      val qx = sx + t * ddx; val qy = sy + t * ddy
      val vx = px - qx; val vy = py - qy
      val d2 = vx * vx + vy * vy
      if (d2 < bestD2) { bestD2 = d2; bPx = px; bPy = py; bQx = qx; bQy = qy }
    }

    /** Closest approach between the current outer segment and [c,d]:
      * non-intersecting segments' minimum is over the four point-to-segment
      * distances. The last two calls write (inner point, outer projection)
      * into (bP, bQ) — role-swapped vs the first two — which is fine: the
      * meter conversion is symmetric in its two points. */
    def consider(cx: Double, cy: Double, dx0: Double, dy0: Double): Unit = {
      ps(ax, ay, cx, cy, dx0, dy0)
      ps(bx, by, cx, cy, dx0, dy0)
      ps(cx, cy, ax, ay, bx, by)
      ps(dx0, dy0, ax, ay, bx, by)
    }

    def visit(e2: Int): Unit = {
      val j2 = nx(e2)
      val cx = cs(2 * e2); val cy = cs(2 * e2 + 1)
      val dx0 = cs(2 * j2); val dy0 = cs(2 * j2 + 1)
      val yLo = math.min(cy, dy0); val yHi = math.max(cy, dy0)
      val yg = math.max(0, math.max(yLo - sMaxY, sMinY - yHi)).toDouble
      if (yg * yg < bestD2) consider(cx, cy, dx0, dy0)
    }
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

    // quick seed: bbox-corner distance upper bound via closest vertices of
    // the first segments — just start from +inf and prune with x-distance.
    val (outer, inner) = if (a.edgeCount >= b.edgeCount) (a, b) else (b, a)
    val s = new DistScan(inner)
    val innerIdx = if (inner.kind == 0) null else inner.edgeIndex

    val nOut = math.max(1, outer.edgeCount)
    var e = 0
    while (e < nOut) {
      var ax = 0; var ay = 0; var bx = 0; var by = 0
      if (outer.kind == 0) { ax = outer.x(0); ay = outer.y(0); bx = ax; by = ay }
      else {
        val j = outer.edgeQ(e)
        ax = outer.x(e); ay = outer.y(e); bx = outer.x(j); by = outer.y(j)
      }
      val sMinX = math.min(ax, bx); val sMaxX = math.max(ax, bx)
      val sMinY = math.min(ay, by); val sMaxY = math.max(ay, by)
      // x-gap lower bound vs inner bbox
      val xGap = math.max(0, math.max(inner.minX - sMaxX, sMinX - inner.maxX))
        .toDouble
      val yGap = math.max(0, math.max(inner.minY - sMaxY, sMinY - inner.maxY))
        .toDouble
      if (xGap * xGap + yGap * yGap < s.bestD2) {
        val best = math.sqrt(s.bestD2)
        val reach = if (best > Int.MaxValue.toDouble) Int.MaxValue
          else best.toInt + 1
        s.ax = ax; s.ay = ay; s.bx = bx; s.by = by
        s.sMinY = sMinY; s.sMaxY = sMaxY
        if (inner.kind == 0) {
          s.consider(inner.x(0), inner.y(0), inner.x(0), inner.y(0))
        } else {
          val lo = (sMinX.toLong - reach).max(Int.MinValue).toInt
          val hi = (sMaxX.toLong + reach).min(Int.MaxValue).toInt
          val lIds = innerIdx.longIds
          val lMin = innerIdx.longMin; val lMax = innerIdx.longMax
          var k = 0
          while (k < lIds.length) {
            if (lMin(k) <= hi && lMax(k) >= lo) s.visit(lIds(k))
            k += 1
          }
          val minXs = innerIdx.minXs; val order = innerIdx.order
          var i = innerIdx.lowerBound(lo)
          while (i < minXs.length && minXs(i) <= hi) {
            s.visit(order(i))
            i += 1
          }
        }
      }
      e += 1
    }
    if (s.bestD2 == Double.MaxValue) Double.MaxValue
    else metersPairD(s.bPx, s.bPy, s.bQx, s.bQy)
  }
}
