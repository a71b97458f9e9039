package graft.geom

import Geo._

/** Predicate tuples per type pair, mirroring the reference's check()
  * semantics (reference: src/spatialjoin/Sweeper.cpp:1662-2279) but derived
  * from the exact boundary-walk machinery in [[Rel]].
  *
  * Directional fields: "aCovByB" = point set a is a subset of point set b.
  * "Strict" containment = covered with no boundary contact (the reference's
  * contains for area/area and line/area pairs; point cases are per OGC).
  */
final case class PairRel(
    isect: Boolean,
    aCovByB: Boolean,
    bCovByA: Boolean,
    aContInB: Boolean,
    bContInA: Boolean,
    touches: Boolean,
    crosses: Boolean, // line/line crosses; line/area crosses (line side)
    overlaps: Boolean,
    interiorIsect: Boolean) // interiors intersect (drives notTouches)

object Relate {

  def relate(a: G, b: G): PairRel = (a.kind, b.kind) match {
    case (0, 0) => pointPoint(a, b)
    case (0, 1) => pointLine(a, b)
    case (1, 0) => pointLine(b, a).swap
    case (0, 2) => pointArea(a, b)
    case (2, 0) => pointArea(b, a).swap
    case (1, 1) => lineLine(a, b)
    case (1, 2) => lineArea(a, b)
    case (2, 1) => lineArea(b, a).swap
    case (2, 2) => areaArea(a, b)
    case _ => PairRel(false, false, false, false, false, false, false, false, false)
  }

  implicit private class Swap(val r: PairRel) extends AnyVal {
    def swap: PairRel = r.copy(
      aCovByB = r.bCovByA, bCovByA = r.aCovByB,
      aContInB = r.bContInA, bContInA = r.aContInB)
  }

  def pointPoint(a: G, b: G): PairRel = {
    val eq = a.x(0) == b.x(0) && a.y(0) == b.y(0)
    PairRel(eq, eq, eq, eq, eq, false, false, false, eq)
  }

  /** point a vs line b. Interior of a line = line minus its endpoints
    * (closed line: no boundary, OGC mod-2). */
  def pointLine(a: G, b: G): PairRel = {
    val px = a.x(0); val py = a.y(0)
    val on = ptOnLine(px, py, b)
    if (!on) return PairRel(false, false, false, false, false, false, false, false, false)
    val closed = b.isClosedLine
    val n = b.nPoints
    val atEnd = !closed && ((px == b.x(0) && py == b.y(0)) ||
      (px == b.x(n - 1) && py == b.y(n - 1)))
    val interior = !atEnd
    // a covered by b always (on); b covers a; contains iff interior;
    // touches iff at endpoint
    PairRel(
      isect = true,
      aCovByB = true, bCovByA = false,
      aContInB = interior, bContInA = false,
      touches = atEnd, crosses = false, overlaps = false,
      interiorIsect = interior)
  }

  /** point a vs area b. */
  def pointArea(a: G, b: G): PairRel = {
    val loc = locate(a.x(0), a.y(0), b)
    PairRel(
      isect = loc != OUT,
      aCovByB = loc != OUT, bCovByA = false,
      aContInB = loc == IN, bContInA = false,
      touches = loc == ON, crosses = false, overlaps = false,
      interiorIsect = loc == IN)
  }

  def lineLine(a: G, b: G): PairRel = {
    val r = Rel.lineLine(a, b)
    val ii = r.ii0 || r.ii1
    PairRel(
      isect = r.contact,
      aCovByB = r.aCovByB, bCovByA = r.bCovByA,
      aContInB = false, bContInA = false, // lines never "contain" lines
      touches = r.contact && !ii,
      crosses = r.ii0 && !r.ii1,
      overlaps = r.ii1 && !r.aCovByB && !r.bCovByA,
      interiorIsect = ii)
  }

  /** line a vs area b. */
  def lineArea(a: G, b: G): PairRel = {
    if (!a.bboxIntersects(b))
      return PairRel(false, false, false, false, false, false, false, false, false)
    // earlyOut: once the walk has both an interior hit and an exterior
    // piece, every field below is already decided (covered=false, ii=true,
    // crosses=true, touches=false) — later contacts cannot change them
    val w = Rel.walkVsArea(a, b, earlyOut = true)
    val ii = w.properCross || w.hasIn
    val covered = !w.properCross && !w.hasOut
    PairRel(
      isect = w.contact || ii,
      aCovByB = covered, bCovByA = false,
      // OGC contains: covered and not entirely on the boundary
      aContInB = covered && ii, bContInA = false,
      touches = w.contact && !ii,
      crosses = ii && w.hasOut,
      overlaps = false,
      interiorIsect = ii)
  }

  def areaArea(a: G, b: G): PairRel = {
    if (!a.bboxIntersects(b))
      return PairRel(false, false, false, false, false, false, false, false, false)
    // walk the SMALLER boundary against the bigger polygon: the walk costs
    // O(edges(curve) x index-window(area)) and every early exit below fires
    // on the first walk — for nested/disjoint pairs the second walk then
    // collapses to O(rings) point locates
    if (b.nPoints < a.nPoints) return areaArea(b, a).swap
    val wA = Rel.walkVsArea(a, b, stopAtProper = true) // a's boundary vs b
    if (wA.properCross) {
      // a transversal boundary crossing is symmetric: both walks would see
      // it, so coverage is excluded both ways, interiors and exteriors
      // intersect both ways, and no later contact can change any field —
      // the walk stopped at the first crossing and walk B never runs
      return PairRel(isect = true, aCovByB = false, bCovByA = false,
        aContInB = false, bContInA = false, touches = false,
        crosses = false, overlaps = true, interiorIsect = true)
    }
    if (!wA.contact) {
      // boundaries never touch: every ring of either polygon lies strictly
      // on one side of the other, so walk B reduces to point locates
      if (wA.hasIn && !wA.hasOut) {
        // a's whole boundary strictly inside b ⇒ a ⊆ b UNLESS one of b's
        // hole rings pokes into a (that ring would sit strictly inside a,
        // undetected by walk A) — one locate per ring of b decides
        var r = 0; var bRingIn = false
        while (r < b.nRings && !bRingIn) {
          val s = b.ringStart(r)
          if (Geo.locate(b.x(s), b.y(s), a) == IN) bRingIn = true
          r += 1
        }
        return if (!bRingIn)
          PairRel(isect = true, aCovByB = true, bCovByA = false,
            aContInB = a.area2 != 0, bContInA = false, touches = false,
            crosses = false, overlaps = false, interiorIsect = true)
        else
          PairRel(isect = true, aCovByB = false, bCovByA = false,
            aContInB = false, bContInA = false, touches = false,
            crosses = false, overlaps = true, interiorIsect = true)
      } else if (wA.hasOut && !wA.hasIn) {
        // a's whole boundary strictly outside b ⇒ either disjoint or b
        // strictly inside a; b's point set is connected and cannot escape
        // a's interior without its boundary meeting a's boundary (no
        // contact) or a's boundary entering b's interior (all-OUT), so one
        // representative locate decides. b inside one of a's holes lands
        // OUT. (ON is impossible without contact; fall through if seen.)
        val loc = Geo.locate(b.x(0), b.y(0), a)
        if (loc == IN)
          return PairRel(isect = true, aCovByB = false, bCovByA = true,
            aContInB = false, bContInA = b.area2 != 0, touches = false,
            crosses = false, overlaps = false, interiorIsect = true)
        else if (loc == OUT)
          return PairRel(false, false, false, false, false, false, false,
            false, false)
      }
      // mixed per-ring sides (annulus configurations) or a defensive ON:
      // fall through to the full second walk
    }
    val wB = Rel.walkVsArea(b, a)
    // an anti-parallel shared boundary piece proves the interiors lie on
    // opposite sides there (e.g. a polygon exactly filling a hole) — it
    // rules out coverage in both directions.
    val opp = wA.hasOnOpposite || wB.hasOnOpposite
    val aCov = !wA.properCross && !wA.hasOut && !wB.hasIn && !opp
    val bCov = !wB.properCross && !wB.hasOut && !wA.hasIn && !opp
    val ii = wA.properCross || wA.hasIn || wB.hasIn ||
      (aCov && a.area2 != 0) || (bCov && b.area2 != 0)
    val contact = wA.contact || wB.contact
    PairRel(
      isect = ii || contact,
      aCovByB = aCov, bCovByA = bCov,
      // OGC contains for areas: covered + interiors intersect (equal
      // polygons contain each other; degenerate zero-area ones don't).
      // Matches the reference's equal-area shortcut writes
      // (Sweeper.cpp:2929-2947) and TestD1/TestD2 assertions.
      aContInB = aCov && ii && a.area2 != 0,
      bContInA = bCov && ii && b.area2 != 0,
      touches = contact && !ii,
      crosses = false,
      overlaps = ii && !aCov && !bCov,
      interiorIsect = ii)
  }

  // ================================================================ DE-9IM

  final val F = -1
  type Mat = Array[Int] // 9 dims, row-major II IB IE BI BB BE EI EB EE

  def matToString(m: Mat): String =
    m.map { case -1 => 'F'; case d => ('0' + d).toChar }.mkString

  def transpose(m: Mat): Mat =
    Array(m(0), m(3), m(6), m(1), m(4), m(7), m(2), m(5), m(8))

  /** cellwise max merge (reference DE9IMatrix::operator+=,
    * used Sweeper.cpp:823-856). */
  def merge(x: Mat, y: Mat): Mat = {
    val out = new Array[Int](9)
    var i = 0
    while (i < 9) { out(i) = math.max(x(i), y(i)); i += 1 }
    out
  }

  /** Full matrix of (a, b); only called for intersecting pairs. */
  def de9im(a: G, b: G): Mat = (a.kind, b.kind) match {
    case (0, 0) =>
      Array(0, F, F, F, F, F, F, F, 2)
    case (0, 1) => transpose(de9imLinePoint(b, a))
    case (1, 0) => de9imLinePoint(a, b)
    case (0, 2) => transpose(de9imAreaPoint(b, a))
    case (2, 0) => de9imAreaPoint(a, b)
    case (1, 1) => de9imLineLine(a, b)
    case (1, 2) => de9imLineArea(a, b)
    case (2, 1) => transpose(de9imLineArea(b, a))
    case (2, 2) => de9imAreaArea(a, b)
    case _ => Array.fill(9)(F)
  }

  private def de9imAreaPoint(a: G, p: G): Mat = {
    val loc = locate(p.x(0), p.y(0), a)
    Array(
      if (loc == IN) 0 else F, F, 2,
      if (loc == ON) 0 else F, F, 1,
      if (loc == OUT) 0 else F, F, 2)
  }

  private def de9imLinePoint(l: G, p: G): Mat = {
    val px = p.x(0); val py = p.y(0)
    val on = ptOnLine(px, py, l)
    val closed = l.isClosedLine
    val n = l.nPoints
    val atEnd = !closed && on && ((px == l.x(0) && py == l.y(0)) ||
      (px == l.x(n - 1) && py == l.y(n - 1)))
    Array(
      if (on && !atEnd) 0 else F, F, 1,
      if (atEnd) 0 else F, F, if (closed) F else 0,
      if (!on) 0 else F, F, 2)
  }

  private def de9imLineLine(a: G, b: G): Mat = {
    val r = Rel.lineLine(a, b)
    def endpointsOff(x: G, y: G): Boolean = { // some endpoint of x not on y
      if (x.isClosedLine) false
      else {
        val n = x.nPoints
        !ptOnLine(x.x(0), x.y(0), y) || !ptOnLine(x.x(n - 1), x.y(n - 1), y)
      }
    }
    val aOpen = !a.isClosedLine
    val bOpen = !b.isClosedLine
    Array(
      if (r.ii1) 1 else if (r.ii0) 0 else F,
      if (r.aIntBnd) 0 else F,
      if (!r.aCovByB) 1 else F,
      if (r.bIntBnd) 0 else F,
      if (r.ab_bb) 0 else F,
      if (aOpen && endpointsOff(a, b)) 0 else F,
      if (!r.bCovByA) 1 else F,
      if (bOpen && endpointsOff(b, a)) 0 else F,
      2)
  }

  /** Point-on-curve probe shared by the point kinds (manual two-tier index
    * iteration — see EdgeIndex.forRange on why not the closure form). */
  def ptOnLine(px: Int, py: Int, l: G): Boolean = {
    val idx = l.edgeIndex
    val cs = l.coords
    val nx = l.nextIdx
    val lIds = idx.longIds; val lMin = idx.longMin; val lMax = idx.longMax
    var k = 0
    while (k < lIds.length) {
      val e = lIds(k)
      if (lMin(k) <= px && lMax(k) >= px) {
        val j = nx(e)
        if (onSeg(px, py, cs(2 * e), cs(2 * e + 1), cs(2 * j), cs(2 * j + 1)))
          return true
      }
      k += 1
    }
    val minXs = idx.minXs; val order = idx.order
    var i = idx.lowerBound(px)
    while (i < minXs.length && minXs(i) <= px) {
      val e = order(i)
      val j = nx(e)
      if (onSeg(px, py, cs(2 * e), cs(2 * e + 1), cs(2 * j), cs(2 * j + 1)))
        return true
      i += 1
    }
    false
  }

  /** M(line a, area b). The EB cell (ext(line) x bnd(area)) is F in the
    * reference's util implementation (see expected matrices in
    * reference tests/TestMain.cpp:829-833); reproduced here. */
  private def de9imLineArea(a: G, b: G): Mat = {
    val w = Rel.walkVsArea(a, b)
    val open = !a.isClosedLine
    val n = a.nPoints
    val loc0 = locate(a.x(0), a.y(0), b)
    val loc1 = locate(a.x(n - 1), a.y(n - 1), b)
    Array(
      if (w.interiorHit) 1 else F,
      if (w.hasOn) 1 else if (w.contactInterior) 0 else F,
      if (w.hasOut) 1 else F,
      if (open && (loc0 == IN || loc1 == IN)) 0 else F,
      if (open && (loc0 == ON || loc1 == ON)) 0 else F,
      if (open && (loc0 == OUT || loc1 == OUT)) 0 else F,
      2,
      F, // reference util quirk: bnd(area) beyond the line is not reported
      2)
  }

  private def de9imAreaArea(a: G, b: G): Mat = {
    val wA = Rel.walkVsArea(a, b)
    val wB = Rel.walkVsArea(b, a)
    val opp = wA.hasOnOpposite || wB.hasOnOpposite
    val aCov = !wA.properCross && !wA.hasOut && !wB.hasIn && !opp
    val bCov = !wB.properCross && !wB.hasOut && !wA.hasIn && !opp
    val ii = wA.properCross || wA.hasIn || wB.hasIn ||
      (aCov && a.area2 != 0) || (bCov && b.area2 != 0)
    val contact = wA.contact || wB.contact
    val contactDim = if (wA.hasOn || wB.hasOn) 1 else if (contact) 0 else F
    Array(
      if (ii) 2 else F,
      if (wB.hasIn) 1 else F,
      if (!aCov) 2 else F,
      if (wA.hasIn) 1 else F,
      contactDim,
      if (wA.hasOut) 1 else F,
      if (!bCov) 2 else F,
      if (wB.hasOut) 1 else F,
      2)
  }

  /** Hard-coded self matrices (reference selfCheck, Sweeper.cpp:2453-2465). */
  val SELF_LINE: Mat = Array(1, 0, F, F, 0, F, F, F, 2)
  val SELF_AREA: Mat = Array(2, F, F, F, 1, F, F, F, 2)
  val SELF_POINT: Mat = Array(0, F, F, F, F, F, F, F, 2)
}
