package graft.geom

import scala.collection.mutable.ArrayBuffer
import Geo._

/** Exact predicate evaluation between single geometries.
  *
  * Replaces the reference's filter cascade + util exact checks
  * (reference: src/spatialjoin/Sweeper.cpp:1662-2279, doCheck 2891-3520)
  * with a boundary-walk algorithm on exact integer arithmetic:
  * every non-transversal contact between a probe curve and an area's
  * boundary happens at an integer point (some segment endpoint), so curve
  * pieces between contacts are classified by exact wedge tests at those
  * points; transversal (proper) crossings immediately prove interior and
  * exterior intersection without needing rational coordinates.
  */
object Rel {

  /** Walk result of a probe curve against an area. */
  final class WalkRes {
    var properCross = false // transversal crossing somewhere
    var hasIn = false       // some 1D curve piece strictly inside the area
    var hasOut = false      // some 1D curve piece strictly outside
    var hasOn = false       // some 1D piece collinear on the boundary
    var hasOnOpposite = false // ON piece with anti-parallel boundary
                              // direction: the two interiors lie on opposite
                              // sides (e.g. a polygon exactly filling a hole)
    var contact = false     // any contact at all (point or 1D)
    var contactInterior = false // a contact not at the open curve's endpoints
    def interiorHit: Boolean = properCross || hasIn
  }

  /** Per-walk scan state: one instance per walkVsArea call, so the inner
    * edge visit is a MONOMORPHIC method call (the old closure form paid a
    * megamorphic dispatch per visited edge plus a closure allocation per
    * curve segment — see EdgeIndex.forRange doc). */
  private final class Walker(val res: WalkRes, area: G,
      open: Boolean, ce0x: Int, ce0y: Int, ce1x: Int, ce1y: Int) {
    val events = new ArrayBuffer[Long]()   // params (dot along segment)
    val evX = new ArrayBuffer[Int]()
    val evY = new ArrayBuffer[Int]()
    val onA = new ArrayBuffer[Long]()      // on-interval starts
    val onB = new ArrayBuffer[Long]()      // on-interval ends
    // current curve segment
    var px = 0; var py = 0; var qx = 0; var qy = 0
    var dx = 0L; var dy = 0L
    var segMinY = 0; var segMaxY = 0
    var segProper = false
    private val aCoords = area.coords
    private val aNext = area.nextIdx

    def markContact(vx: Int, vy: Int): Unit = {
      res.contact = true
      if (!open || !((vx == ce0x && vy == ce0y) || (vx == ce1x && vy == ce1y)))
        res.contactInterior = true
    }

    def visit(e: Int): Unit = {
      val bi = aNext(e)
      val ax = aCoords(2 * e); val ay = aCoords(2 * e + 1)
      val bx = aCoords(2 * bi); val by = aCoords(2 * bi + 1)
      if (!(math.max(ay, by) < segMinY || math.min(ay, by) > segMaxY)) {
        val o1 = orient(ax, ay, bx, by, px, py)
        val o2 = orient(ax, ay, bx, by, qx, qy)
        if (o1 == 0 && o2 == 0) {
          // collinear: projection overlap along the curve segment
          val len2 = dx * dx + dy * dy
          val ta = dot(ax - px, ay - py, dx, dy)
          val tb = dot(bx - px, by - py, dx, dy)
          val lo = math.max(math.min(ta, tb), 0L)
          val hi = math.min(math.max(ta, tb), len2)
          // integer point x/y for a param (one of the 4 endpoints)
          def ptX(t: Long): Int =
            if (t == 0L) px else if (t == len2) qx
            else if (t == ta) ax else bx
          def ptY(t: Long): Int =
            if (t == 0L) py else if (t == len2) qy
            else if (t == ta) ay else by
          if (lo < hi) {
            onA += lo; onB += hi; res.contact = true; res.hasOn = true
            res.contactInterior = true
            if (dot(bx - ax, by - ay, dx, dy) < 0) res.hasOnOpposite = true
            events += lo; evX += ptX(lo); evY += ptY(lo)
            events += hi; evX += ptX(hi); evY += ptY(hi)
          } else if (lo == hi) { // single-point touch
            val vx = ptX(lo); val vy = ptY(lo)
            events += lo; evX += vx; evY += vy
            markContact(vx, vy)
          }
        } else {
          val o3 = orient(px, py, qx, qy, ax, ay)
          val o4 = orient(px, py, qx, qy, bx, by)
          var ev = false
          // endpoint-on-segment contacts (integer points)
          if (o1 == 0 && segBetween(px, py, ax, ay, bx, by)) {
            events += 0L; evX += px; evY += py; ev = true
            markContact(px, py)
          }
          if (o2 == 0 && segBetween(qx, qy, ax, ay, bx, by)) {
            events += dx * dx + dy * dy; evX += qx; evY += qy; ev = true
            markContact(qx, qy)
          }
          if (o3 == 0 && segBetween(ax, ay, px, py, qx, qy)) {
            events += dot(ax - px, ay - py, dx, dy); evX += ax; evY += ay
            ev = true
            markContact(ax, ay)
          }
          if (o4 == 0 && segBetween(bx, by, px, py, qx, qy)) {
            events += dot(bx - px, by - py, dx, dy); evX += bx; evY += by
            ev = true
            markContact(bx, by)
          }
          if (!ev && o1 * o2 < 0 && o3 * o4 < 0) {
            segProper = true
            res.properCross = true
            res.hasIn = true
            res.hasOut = true
            res.contact = true
            res.contactInterior = true
          }
        }
      }
    }
  }

  /** Walk `curve` (a line, or a polygon whose boundary is probed) against
    * polygon `area`. */
  def walkVsArea(curve: G, area: G, earlyOut: Boolean = false,
      stopAtProper: Boolean = false): WalkRes = {
    val res = new WalkRes
    // open-line endpoints, for contactInterior (rings: every contact counts)
    val open = curve.kind == 1 && !curve.isClosedLine
    val cl = curve.nPoints - 1
    val w = new Walker(res, area, open, curve.x(0), curve.y(0),
      curve.x(cl), curve.y(cl))
    val nSeg = curve.edgeCount
    val aIdx = area.edgeIndex
    val lIds = aIdx.longIds; val lMin = aIdx.longMin; val lMax = aIdx.longMax
    val minXs = aIdx.minXs; val order = aIdx.order
    var seg = 0
    // carry-forward classification: a segment with NO boundary events lies
    // strictly on one side, and if it starts where the previous segment
    // ended (same ring, no contact there), that side is the previous
    // segment's side — the expensive locate() ray cast is needed only once
    // per contact-free run, not once per segment
    val UNKNOWN = Int.MinValue
    var lastClass = UNKNOWN
    var prevQx = Int.MinValue; var prevQy = Int.MinValue
    while (seg < nSeg && !(res.properCross && res.hasOn && res.contact)) {
      val qi = curve.edgeQ(seg)
      val px = curve.x(seg); val py = curve.y(seg)
      val qx = curve.x(qi); val qy = curve.y(qi)
      val dx = (qx - px).toLong; val dy = (qy - py).toLong
      val segMinX = math.min(px, qx); val segMaxX = math.max(px, qx)
      val segMinY = math.min(py, qy); val segMaxY = math.max(py, qy)
      w.events.clear(); w.evX.clear(); w.evY.clear()
      w.onA.clear(); w.onB.clear()
      w.px = px; w.py = py; w.qx = qx; w.qy = qy
      w.dx = dx; w.dy = dy
      w.segMinY = segMinY; w.segMaxY = segMaxY
      w.segProper = false

      // fast reject: segment bbox vs area bbox
      val mayTouch = !(segMaxX < area.minX || segMinX > area.maxX ||
        segMaxY < area.minY || segMinY > area.maxY)

      if (mayTouch) {
        var k = 0
        while (k < lIds.length) {
          if (lMin(k) <= segMaxX && lMax(k) >= segMinX) w.visit(lIds(k))
          k += 1
        }
        var i = aIdx.lowerBound(segMinX)
        while (i < minXs.length && minXs(i) <= segMaxX) {
          w.visit(order(i))
          i += 1
        }
      }

      if (!w.segProper && !(dx == 0 && dy == 0)) {
        if (w.events.isEmpty && w.onA.isEmpty) {
          // no boundary contact on this segment: strictly one side
          val cls =
            if (!mayTouch) OUT
            else if (lastClass != UNKNOWN && px == prevQx && py == prevQy)
              lastClass
            else locate(px, py, area)
          cls match {
            case IN => res.hasIn = true
            case OUT => res.hasOut = true
            case _ => res.hasOn = true // defensive; shouldn't happen
          }
          lastClass = cls
        } else {
          classifySegment(res, area, px, py, qx, qy, dx, dy,
            w.events, w.evX, w.evY, w.onA, w.onB, mayTouch)
          lastClass = UNKNOWN
        }
      } else lastClass = UNKNOWN
      prevQx = qx; prevQy = qy
      if (earlyOut && res.interiorHit && res.hasOut) return res
      if (stopAtProper && res.properCross) return res
      seg += 1
    }
    res
  }

  /** v strictly-or-inclusively between segment [a,b] given collinearity. */
  private def segBetween(vx: Long, vy: Long, ax: Long, ay: Long,
      bx: Long, by: Long): Boolean =
    math.min(ax, bx) <= vx && vx <= math.max(ax, bx) &&
      math.min(ay, by) <= vy && vy <= math.max(ay, by)

  /** Classify the pieces of one curve segment split at boundary contacts. */
  private def classifySegment(res: WalkRes, area: G,
      px: Int, py: Int, qx: Int, qy: Int, dx: Long, dy: Long,
      events: ArrayBuffer[Long], evX: ArrayBuffer[Int], evY: ArrayBuffer[Int],
      onA: ArrayBuffer[Long], onB: ArrayBuffer[Long],
      mayTouch: Boolean): Unit = {
    val len2 = dx * dx + dy * dy
    if (events.isEmpty && onA.isEmpty) {
      // whole segment on one side
      if (!mayTouch) res.hasOut = true
      else locate(px, py, area) match {
        case IN => res.hasIn = true
        case OUT => res.hasOut = true
        case ON => res.hasOn = true // defensive; shouldn't happen
      }
      return
    }
    // merge ON intervals
    val n = onA.length
    val idx = (0 until n).sortBy(onA(_))
    val mA = new ArrayBuffer[Long](); val mB = new ArrayBuffer[Long]()
    for (i <- idx) {
      if (mA.nonEmpty && onA(i) <= mB.last) {
        if (onB(i) > mB.last) mB(mB.length - 1) = onB(i)
      } else { mA += onA(i); mB += onB(i) }
    }
    // collect split params: 0, len2, event params, interval bounds
    val cuts = ArrayBuffer[Long](0L, len2)
    cuts ++= events
    cuts ++= mA
    cuts ++= mB
    val sorted = cuts.distinct.sorted
    // map param -> known integer point (events only)
    val ptOf = scala.collection.mutable.LongMap.empty[(Int, Int)]
    var i = 0
    while (i < events.length) {
      if (evX(i) != Int.MinValue) ptOf(events(i)) = (evX(i), evY(i))
      i += 1
    }
    def inMerged(a: Long, b: Long): Boolean = {
      var k = 0
      while (k < mA.length) {
        if (mA(k) <= a && b <= mB(k)) return true
        k += 1
      }
      false
    }
    var j = 0
    while (j + 1 < sorted.length) {
      val a = sorted(j); val b = sorted(j + 1)
      if (a < b && !inMerged(a, b)) {
        // classify piece (a,b): anchor at a known integer point if possible
        val cls = ptOf.get(a) match {
          case Some((vx, vy)) => dirClass(area, vx, vy, dx, dy)
          case None =>
            ptOf.get(b) match {
              case Some((vx, vy)) => dirClass(area, vx, vy, -dx, -dy)
              case None =>
                if (a == 0L) locate(px, py, area)
                else if (b == len2) locate(qx, qy, area)
                else ON // unanchorable: conservative (rare sentinel case)
            }
        }
        cls match {
          case IN => res.hasIn = true
          case OUT => res.hasOut = true
          case ON => res.hasOn = true
        }
      }
      j += 1
    }
    // also: piece before first cut / after last cut are covered since 0 and
    // len2 are always cuts.
  }

  /** Does direction (dx,dy) at boundary point (vx,vy) point into the area's
    * interior (IN), along the boundary (ON), or outside (OUT)?
    * Interior is the intersection of all incident ring wedges (shells CCW,
    * holes CW => interior always on the left of the directed boundary). */
  def dirClass(area: G, vx: Int, vy: Int, dx: Long, dy: Long): Int = {
    val s = new DirScan(area, vx, vy, dx, dy)
    val idx = area.edgeIndex
    val lIds = idx.longIds; val lMin = idx.longMin; val lMax = idx.longMax
    var k = 0
    while (k < lIds.length) {
      if (lMin(k) <= vx && lMax(k) >= vx) s.visit(lIds(k))
      k += 1
    }
    val minXs = idx.minXs; val order = idx.order
    var i = idx.lowerBound(vx)
    while (i < minXs.length && minXs(i) <= vx) {
      s.visit(order(i))
      i += 1
    }
    if (!s.anyWedge) locate(vx, vy, area) // not actually on boundary
    else if (s.anyOn) ON
    else if (s.allIn) IN
    else OUT
  }

  /** Wedge accumulator for [[dirClass]] (monomorphic visit). */
  private final class DirScan(area: G, vx: Int, vy: Int, dx: Long, dy: Long) {
    var anyWedge = false
    var allIn = true
    var anyOn = false
    private val cs = area.coords
    private val nx = area.nextIdx

    def visit(e: Int): Unit = {
      val bi = nx(e)
      val ax = cs(2 * e); val ay = cs(2 * e + 1)
      val bx = cs(2 * bi); val by = cs(2 * bi + 1)
      // consider only the edge starting at its p-vertex == v, or v strictly
      // inside the edge; this gives each incidence exactly once (the edge
      // ENDING at v is handled as the wedge of its successor start).
      if (ax == vx && ay == vy) {
        // vertex wedge: incoming edge is the ring predecessor
        val prei = ringPred(area, e)
        val prx = cs(2 * prei); val pry = cs(2 * prei + 1)
        val oxx = (bx - vx).toLong; val oyy = (by - vy).toLong // outgoing O
        val pxx = (prx - vx).toLong; val pyy = (pry - vy).toLong // back = -I
        anyWedge = true
        wedgeClass(oxx, oyy, pxx, pyy, dx, dy) match {
          case IN => ()
          case ON => anyOn = true
          case OUT => allIn = false
        }
      } else if (!(bx == vx && by == vy) &&
          orient(ax, ay, bx, by, vx, vy) == 0 &&
          segBetween(vx, vy, ax, ay, bx, by)) {
        // v strictly inside edge: straight wedge, interior on the left
        val oxx = (bx - vx).toLong; val oyy = (by - vy).toLong
        val pxx = (ax - vx).toLong; val pyy = (ay - vy).toLong
        anyWedge = true
        wedgeClass(oxx, oyy, pxx, pyy, dx, dy) match {
          case IN => ()
          case ON => anyOn = true
          case OUT => allIn = false
        }
      }
    }
  }

  /** Ring predecessor vertex index of vertex i. */
  private def ringPred(g: G, i: Int): Int = {
    val r = g.ringOf(i)
    val s = g.ringStart(r)
    if (i == s) g.ringEnds(r) - 1 else i - 1
  }

  /** Classify direction d against the wedge from O ccw to P (P = reversed
    * incoming). Interior of the area is strictly inside that wedge. */
  private def wedgeClass(ox: Long, oy: Long, pxx: Long, pyy: Long,
      dx: Long, dy: Long): Int = {
    val cOD = cross(ox, oy, dx, dy)
    val cDP = cross(dx, dy, pxx, pyy)
    // along either wedge arm -> ON
    if (cOD == 0 && dot(ox, oy, dx, dy) > 0) return ON
    if (cDP == 0 && dot(pxx, pyy, dx, dy) > 0) return ON
    val cOP = cross(ox, oy, pxx, pyy)
    if (cOP > 0) { // convex wedge
      if (cOD > 0 && cDP > 0) IN else OUT
    } else if (cOP < 0) { // reflex wedge
      if (cOD > 0 || cDP > 0) IN else OUT
    } else {
      // O and P collinear: straight-through boundary or a zero-width spike
      if (dot(ox, oy, pxx, pyy) < 0) { // straight boundary: left side is in
        if (cOD > 0) IN else OUT
      } else OUT // spike: empty interior
    }
  }

  // =================================================================== line

  /** Contact analysis between two lines. */
  final class LLRes {
    var contact = false
    var ii0 = false // isolated interior-interior contact point
    var ii1 = false // 1D shared piece
    var aCovByB = false
    var bCovByA = false
    // boundary cell bits for DE-9IM
    var ab_bb = false // some endpoint of A equals some endpoint of B
    var aIntBnd = false // some endpoint of B in interior of A
    var bIntBnd = false // some endpoint of A in interior of B
  }

  /** Per-call scan state for lineLine: same monomorphic-visit rationale as
    * [[Walker]]. `other` is the line whose index is probed (b). */
  private final class LLScan(val res: LLRes, a: G, b: G) {
    private val aOpen = !a.isClosedLine
    private val bOpen = !b.isClosedLine
    private val a0x = a.x(0); private val a0y = a.y(0)
    private val a1x = a.x(a.nPoints - 1); private val a1y = a.y(a.nPoints - 1)
    private val b0x = b.x(0); private val b0y = b.y(0)
    private val b1x = b.x(b.nPoints - 1); private val b1y = b.y(b.nPoints - 1)
    private val bCoords = b.coords
    private val bNext = b.nextIdx
    val onA = new ArrayBuffer[Long]()
    val onB = new ArrayBuffer[Long]()
    // current a-segment
    var px = 0; var py = 0; var qx = 0; var qy = 0
    var dx = 0L; var dy = 0L; var len2 = 0L
    var sMinY = 0; var sMaxY = 0

    def isBndA(x: Int, y: Int): Boolean = aOpen &&
      ((x == a0x && y == a0y) || (x == a1x && y == a1y))
    def isBndB(x: Int, y: Int): Boolean = bOpen &&
      ((x == b0x && y == b0y) || (x == b1x && y == b1y))

    def contactPt(vx: Int, vy: Int): Unit = {
      res.contact = true
      val bA = isBndA(vx, vy)
      val bB = isBndB(vx, vy)
      if (bA && bB) res.ab_bb = true
      else if (bA && !bB) res.bIntBnd = true // endpoint of A interior to B...
      else if (!bA && bB) res.aIntBnd = true
      else res.ii0 = true
    }

    def visit(e: Int): Unit = {
      val bi2 = bNext(e)
      val ax = bCoords(2 * e); val ay = bCoords(2 * e + 1)
      val bx = bCoords(2 * bi2); val by = bCoords(2 * bi2 + 1)
      if (!(math.max(ay, by) < sMinY || math.min(ay, by) > sMaxY)) {
        val o1 = orient(ax, ay, bx, by, px, py)
        val o2 = orient(ax, ay, bx, by, qx, qy)
        if (o1 == 0 && o2 == 0) {
          val ta = dot(ax - px, ay - py, dx, dy)
          val tb = dot(bx - px, by - py, dx, dy)
          val lo = math.max(math.min(ta, tb), 0L)
          val hi = math.min(math.max(ta, tb), len2)
          if (lo < hi) { onA += lo; onB += hi; res.contact = true
            res.ii1 = true }
          else if (lo == hi) {
            // endpoint touch on the shared line: the touch point is one of
            // the b-edge endpoints (integer); find which
            res.contact = true
            if (ta == lo) contactPt(ax, ay) else contactPt(bx, by)
          }
        } else {
          val o3 = orient(px, py, qx, qy, ax, ay)
          val o4 = orient(px, py, qx, qy, bx, by)
          var ev = false
          if (o1 == 0 && segBetween(px, py, ax, ay, bx, by)) {
            contactPt(px, py); ev = true
          }
          if (o2 == 0 && segBetween(qx, qy, ax, ay, bx, by)) {
            contactPt(qx, qy); ev = true
          }
          if (o3 == 0 && segBetween(ax, ay, px, py, qx, qy)) {
            contactPt(ax, ay); ev = true
          }
          if (o4 == 0 && segBetween(bx, by, px, py, qx, qy)) {
            contactPt(bx, by); ev = true
          }
          if (!ev && o1 * o2 < 0 && o3 * o4 < 0) {
            // transversal cross at segment interiors: interior of both
            res.contact = true
            res.ii0 = true
          }
        }
      }
    }
  }

  def lineLine(a: G, b: G): LLRes = {
    val res = new LLRes
    if (!a.bboxIntersects(b)) return res
    val s = new LLScan(res, a, b)
    // per-segment-of-a coverage intervals by b (for aCovByB), and contacts
    val nA = a.edgeCount
    val bIdx = b.edgeIndex
    val lIds = bIdx.longIds; val lMin = bIdx.longMin; val lMax = bIdx.longMax
    val minXs = bIdx.minXs; val order = bIdx.order
    var covA = true
    var seg = 0
    while (seg < nA) {
      val qi = a.edgeQ(seg)
      val px = a.x(seg); val py = a.y(seg)
      val qx = a.x(qi); val qy = a.y(qi)
      val dx = (qx - px).toLong; val dy = (qy - py).toLong
      val len2 = dx * dx + dy * dy
      s.onA.clear(); s.onB.clear()
      val sMinX = math.min(px, qx); val sMaxX = math.max(px, qx)
      s.px = px; s.py = py; s.qx = qx; s.qy = qy
      s.dx = dx; s.dy = dy; s.len2 = len2
      s.sMinY = math.min(py, qy); s.sMaxY = math.max(py, qy)
      var k = 0
      while (k < lIds.length) {
        if (lMin(k) <= sMaxX && lMax(k) >= sMinX) s.visit(lIds(k))
        k += 1
      }
      var i = bIdx.lowerBound(sMinX)
      while (i < minXs.length && minXs(i) <= sMaxX) {
        s.visit(order(i))
        i += 1
      }
      // coverage of this a-segment by b (most segments carry 0 or 1
      // coverage intervals — avoid the boxed sort for those)
      if (len2 > 0) {
        val onA = s.onA; val onB = s.onB
        if (onA.isEmpty) covA = false
        else if (onA.length == 1) {
          if (!(onA(0) <= 0L && onB(0) >= len2)) covA = false
        } else {
          val idx = (0 until onA.length).sortBy(onA(_))
          var reach = 0L
          var full = false
          for (i <- idx) {
            if (onA(i) > reach) { full = false; reach = Long.MinValue }
            else if (reach != Long.MinValue && onB(i) > reach)
              reach = onB(i)
            if (reach >= len2) full = true
          }
          if (!full) covA = false
        }
      }
      seg += 1
    }
    res.aCovByB = covA && nA > 0

    // bCovByA via a reduced pass (coverage only); without any contact at
    // all, coverage is impossible — skip the second full scan
    res.bCovByA = res.contact && coveredBy(b, a)
    res
  }

  /** Collinear-overlap collector for [[coveredBy]] (monomorphic visit). */
  private final class CovScan(outer: G) {
    private val oCoords = outer.coords
    private val oNext = outer.nextIdx
    val onA = new ArrayBuffer[Long]()
    val onB = new ArrayBuffer[Long]()
    var px = 0; var py = 0; var qx = 0; var qy = 0
    var dx = 0L; var dy = 0L; var len2 = 0L

    def visit(e: Int): Unit = {
      val bi2 = oNext(e)
      val ax = oCoords(2 * e); val ay = oCoords(2 * e + 1)
      val bx = oCoords(2 * bi2); val by = oCoords(2 * bi2 + 1)
      val o1 = orient(ax, ay, bx, by, px, py)
      val o2 = orient(ax, ay, bx, by, qx, qy)
      if (o1 == 0 && o2 == 0) {
        val ta = dot(ax - px, ay - py, dx, dy)
        val tb = dot(bx - px, by - py, dx, dy)
        val lo = math.max(math.min(ta, tb), 0L)
        val hi = math.min(math.max(ta, tb), len2)
        if (lo < hi) { onA += lo; onB += hi }
      }
    }
  }

  /** Pure 1D coverage: every point of `inner` on `outer`. */
  def coveredBy(inner: G, outer: G): Boolean = {
    val n = inner.edgeCount
    val s = new CovScan(outer)
    val oIdx = outer.edgeIndex
    val lIds = oIdx.longIds; val lMin = oIdx.longMin; val lMax = oIdx.longMax
    val minXs = oIdx.minXs; val order = oIdx.order
    var seg = 0
    while (seg < n) {
      val qi = inner.edgeQ(seg)
      val px = inner.x(seg); val py = inner.y(seg)
      val qx = inner.x(qi); val qy = inner.y(qi)
      val dx = (qx - px).toLong; val dy = (qy - py).toLong
      val len2 = dx * dx + dy * dy
      if (len2 > 0) {
        s.onA.clear(); s.onB.clear()
        val sMinX = math.min(px, qx); val sMaxX = math.max(px, qx)
        s.px = px; s.py = py; s.qx = qx; s.qy = qy
        s.dx = dx; s.dy = dy; s.len2 = len2
        var k = 0
        while (k < lIds.length) {
          if (lMin(k) <= sMaxX && lMax(k) >= sMinX) s.visit(lIds(k))
          k += 1
        }
        var i = oIdx.lowerBound(sMinX)
        while (i < minXs.length && minXs(i) <= sMaxX) {
          s.visit(order(i))
          i += 1
        }
        val onA = s.onA; val onB = s.onB
        if (onA.isEmpty) return false
        if (onA.length == 1) {
          if (!(onA(0) <= 0L && onB(0) >= len2)) return false
        } else {
          val idx = (0 until onA.length).sortBy(onA(_))
          var reach = 0L
          for (i <- idx) {
            if (onA(i) > reach) return false
            if (onB(i) > reach) reach = onB(i)
          }
          if (reach < len2) return false
        }
      }
      seg += 1
    }
    true
  }
}
