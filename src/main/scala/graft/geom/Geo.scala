package graft.geom

/** Core integer geometry model.
  *
  * Coordinates are WGS84 lon/lat projected to web mercator, scaled by
  * PREC = 10 and truncated to Int (reference: src/spatialjoin/WKTParse.h:107-111,
  * src/spatialjoin/BoxIds.h:11-20). All exact predicates are integer
  * arithmetic in this space; cross products of coordinate deltas fit in Long
  * (|coord| <= ~2.01e8, so products <= ~1.7e17 << 2^63).
  */
object Geo {
  /** PREC from reference BoxIds.h:11. */
  final val PREC = 10.0
  /** Web-mercator half-width in projected meters (BoxIds.h:19-20). */
  final val MERC_HALF = 20037508.3427892
  /** World width in int coords. */
  final val WORLD_W: Double = MERC_HALF * PREC * 2.0

  /** lon/lat -> int32 web-mercator*PREC, trunc-toward-zero like the
    * reference's static_cast<int>. */
  def projX(lon: Double): Int = (lon / 180.0 * MERC_HALF * PREC).toInt
  def projY(lat: Double): Int = {
    val y = math.log(math.tan((90.0 + lat) * math.Pi / 360.0)) / math.Pi * MERC_HALF
    (y * PREC).toInt
  }
  /** Inverse, for distance scale factors. */
  def invLat(yInt: Double): Double = {
    val y = yInt / PREC
    math.atan(math.exp(y * math.Pi / MERC_HALF)) * 360.0 / math.Pi - 90.0
  }

  // ------------------------------------------------------------ primitives

  /** Sign of cross((b-a),(c-a)): >0 left / CCW, <0 right / CW, 0 collinear. */
  def orient(ax: Long, ay: Long, bx: Long, by: Long, cx: Long, cy: Long): Int = {
    val v = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    java.lang.Long.signum(v).toInt
  }

  def cross(ax: Long, ay: Long, bx: Long, by: Long): Long = ax * by - ay * bx
  def dot(ax: Long, ay: Long, bx: Long, by: Long): Long = ax * bx + ay * by

  /** p strictly/inclusively on segment [a,b] (collinear + within box). */
  def onSeg(px: Long, py: Long, ax: Long, ay: Long, bx: Long, by: Long): Boolean =
    orient(ax, ay, bx, by, px, py) == 0 &&
      math.min(ax, bx) <= px && px <= math.max(ax, bx) &&
      math.min(ay, by) <= py && py <= math.max(ay, by)

  // ---------------------------------------------------------------- types

  /** One single (sub-)geometry: a point, a linestring, or a polygon with
    * holes. Polygons store rings concatenated in `coords` (x,y pairs),
    * `ringEnds(i)` = exclusive end offset (in points) of ring i; ring 0 is
    * the shell. Rings are stored WITHOUT the closing duplicate point and
    * normalized: shell CCW (positive signed area), holes CW. Lines store one
    * "ring" that is an open path.
    */
  final class G(
      val kind: Int, // 0 = point, 1 = line, 2 = polygon
      val coords: Array[Int],
      val ringEnds: Array[Int]) {

    val (minX, minY, maxX, maxY) = {
      var i = 0; var x0 = Int.MaxValue; var y0 = Int.MaxValue
      var x1 = Int.MinValue; var y1 = Int.MinValue
      while (i < coords.length) {
        val x = coords(i); val y = coords(i + 1)
        if (x < x0) x0 = x; if (x > x1) x1 = x
        if (y < y0) y0 = y; if (y > y1) y1 = y
        i += 2
      }
      (x0, y0, x1, y1)
    }

    def nPoints: Int = coords.length / 2
    def nRings: Int = ringEnds.length
    def ringStart(r: Int): Int = if (r == 0) 0 else ringEnds(r - 1)
    def x(i: Int): Int = coords(2 * i)
    def y(i: Int): Int = coords(2 * i + 1)

    /** Twice the signed area, exact (shoelace); polygons only. */
    lazy val area2: Long = {
      var tot = 0L
      var r = 0
      while (r < nRings) {
        val s = ringStart(r); val e = ringEnds(r)
        var i = s
        var acc = 0L
        while (i < e) {
          val j = if (i + 1 == e) s else i + 1
          acc += x(i).toLong * y(j) - x(j).toLong * y(i)
          i += 1
        }
        tot += acc // holes are CW => negative, subtracting hole area
        r += 1
      }
      tot
    }

    /** Euclidean length in int-coord units (lines). */
    lazy val length: Double = {
      var acc = 0.0
      var i = 0
      val n = nPoints
      while (i + 1 < n) {
        val dx = (x(i + 1) - x(i)).toDouble
        val dy = (y(i + 1) - y(i)).toDouble
        acc += math.sqrt(dx * dx + dy * dy)
        i += 1
      }
      acc
    }

    /** 45°-diag extents (d = x+y, e = x−y; the P5 filter axes), memoized:
      * the fused kernel needs them once per COVER ROW, and a multi-cell
      * geometry is decoded once per partition but seen on many rows — the
      * coords re-walk per row was measurable at 1M geoms. Plain vars with a
      * guard, not lazy vals: a G is task-confined, and an idempotent racy
      * recompute would write identical values anyway. */
    var dMin = 0L; var dMax = 0L
    var eMin = 0L; var eMax = 0L
    private[this] var diagOk = false
    def ensureDiag(): Unit = if (!diagOk) {
      var i = 0
      var d0 = Long.MaxValue; var d1 = Long.MinValue
      var e0 = Long.MaxValue; var e1 = Long.MinValue
      while (i < coords.length) {
        val d = coords(i).toLong + coords(i + 1)
        val e = coords(i).toLong - coords(i + 1)
        if (d < d0) d0 = d
        if (d > d1) d1 = d
        if (e < e0) e0 = e
        if (e > e1) e1 = e
        i += 2
      }
      dMin = d0; dMax = d1; eMin = e0; eMax = e1
      diagOk = true
    }

    /** The reference treats a line's first/last points as its boundary even
      * when the line is closed (no OGC mod-2 rule): the closed `grenzpart`
      * fixture's DE-9IM has BB=0 against freiburg1
      * (reference tests/TestMain.cpp:829-833). Always false, kept for
      * documentation. */
    def isClosedLine: Boolean = false

    def bboxIntersects(o: G): Boolean =
      !(o.minX > maxX || o.maxX < minX || o.minY > maxY || o.maxY < minY)

    /** Edge count (polygon: cyclic edges of all rings; line: open path). */
    def edgeCount: Int =
      if (kind == 2) nPoints
      else if (kind == 1) math.max(0, nPoints - 1)
      else 0

    /** next-vertex index per edge start (cyclic within ring for polygons). */
    lazy val nextIdx: Array[Int] = {
      if (kind == 1) Array.range(1, nPoints)
      else {
        val out = new Array[Int](nPoints)
        var r = 0
        while (r < nRings) {
          val s = ringStart(r); val e = ringEnds(r)
          var i = s
          while (i < e) { out(i) = if (i + 1 == e) s else i + 1; i += 1 }
          r += 1
        }
        out
      }
    }

    /** Edge e start vertex index (== e) and end vertex index. */
    @inline def edgeP(e: Int): Int = e
    @inline def edgeQ(e: Int): Int = nextIdx(e)

    /** Ring index of a polygon vertex index. */
    def ringOf(i: Int): Int = {
      var r = 0
      while (ringEnds(r) <= i) r += 1
      r
    }

    /** Edges sorted by min-x plus the max x-span, for range queries
      * (role of the reference's maxSegLen fast-sweep-skip,
      * reference: src/spatialjoin/Sweeper.cpp:278-284). */
    lazy val edgeIndex: EdgeIndex = EdgeIndex.build(this, xAxis = true)

    /** Same, on y — serves the +x ray cast in locate(). */
    lazy val edgeIndexY: EdgeIndex = EdgeIndex.build(this, xAxis = false)
  }

  object G {
    def point(px: Int, py: Int): G = new G(0, Array(px, py), Array(1))
    def line(cs: Array[Int]): G = new G(1, cs, Array(cs.length / 2))
    /** rings: shell first; orientation gets normalized here. */
    def polygon(rings: Array[Array[Int]]): G = {
      val norm = rings.zipWithIndex.map { case (ring0, idx) =>
        // drop closing dup point if present
        val ring =
          if (ring0.length >= 4 && ring0(0) == ring0(ring0.length - 2) &&
            ring0(1) == ring0(ring0.length - 1))
            java.util.Arrays.copyOf(ring0, ring0.length - 2)
          else ring0
        var acc = 0L
        val n = ring.length / 2
        var i = 0
        while (i < n) {
          val j = (i + 1) % n
          acc += ring(2 * i).toLong * ring(2 * j + 1) -
            ring(2 * j).toLong * ring(2 * i + 1)
          i += 1
        }
        val wantCCW = idx == 0
        val isCCW = acc > 0
        if (acc == 0 || isCCW == wantCCW) ring
        else { // reverse point order
          val out = new Array[Int](ring.length)
          var k = 0
          while (k < n) {
            out(2 * k) = ring(2 * (n - 1 - k))
            out(2 * k + 1) = ring(2 * (n - 1 - k) + 1)
            k += 1
          }
          out
        }
      }
      val coords = new Array[Int](norm.map(_.length).sum)
      val ends = new Array[Int](norm.length)
      var off = 0
      var r = 0
      while (r < norm.length) {
        System.arraycopy(norm(r), 0, coords, off, norm(r).length)
        off += norm(r).length
        ends(r) = off / 2
        r += 1
      }
      new G(2, coords, ends)
    }
  }

  /** Min-area oriented bounding box of g's vertices, padded outward by
    * `pad` int units (absorbs the corner rounding), as a 4-point polygon —
    * a conservative superset of the geometry. Convex hull via monotone
    * chain, then the classic min-area-rectangle-over-hull-edges sweep.
    * Returns null for degenerate hulls. (reference: Sweeper.cpp:307-315,
    * convexHull(pad(getOrientedEnvelope(...), 10)).) */
  def orientedBox(g: G, pad: Double): G = {
    val pts = Array.tabulate(g.nPoints)(i => (g.x(i), g.y(i)))
      .distinct.sortBy(p => (p._1, p._2))
    if (pts.length < 3) return null
    def cr(o: (Int, Int), a: (Int, Int), b: (Int, Int)): Long =
      (a._1 - o._1).toLong * (b._2 - o._2) -
        (a._2 - o._2).toLong * (b._1 - o._1)
    val h = new Array[(Int, Int)](2 * pts.length)
    var k = 0
    for (p <- pts) {
      while (k >= 2 && cr(h(k - 2), h(k - 1), p) <= 0) k -= 1
      h(k) = p; k += 1
    }
    val lower = k + 1
    for (i <- pts.length - 2 to 0 by -1) {
      val p = pts(i)
      while (k >= lower && cr(h(k - 2), h(k - 1), p) <= 0) k -= 1
      h(k) = p; k += 1
    }
    val hull = h.take(k - 1)
    if (hull.length < 3) return null

    var best = Double.MaxValue
    var corners: Array[Int] = null
    var i = 0
    while (i < hull.length) {
      val (x0, y0) = hull(i)
      val (x1, y1) = hull((i + 1) % hull.length)
      val dx = (x1 - x0).toDouble; val dy = (y1 - y0).toDouble
      val len = math.hypot(dx, dy)
      if (len > 0) {
        val ux = dx / len; val uy = dy / len
        var uMin = Double.MaxValue; var uMax = -Double.MaxValue
        var vMin = Double.MaxValue; var vMax = -Double.MaxValue
        for ((px, py) <- hull) {
          val u = px * ux + py * uy
          val v = -px * uy + py * ux
          if (u < uMin) uMin = u; if (u > uMax) uMax = u
          if (v < vMin) vMin = v; if (v > vMax) vMax = v
        }
        val area = (uMax - uMin) * (vMax - vMin)
        if (area < best) {
          best = area
          val u0 = uMin - pad; val u1 = uMax + pad
          val v0 = vMin - pad; val v1 = vMax + pad
          def px(u: Double, v: Double): Int =
            math.round(u * ux - v * uy).toInt
          def py(u: Double, v: Double): Int =
            math.round(u * uy + v * ux).toInt
          corners = Array(
            px(u0, v0), py(u0, v0), px(u1, v0), py(u1, v0),
            px(u1, v1), py(u1, v1), px(u0, v1), py(u0, v1))
        }
      }
      i += 1
    }
    if (corners == null) null else G.polygon(Array(corners))
  }

  /** Point-in-polygon result. */
  final val OUT = 0
  final val ON = 1
  final val IN = 2

  /** Exact ray-cast point location vs polygon with holes. Iterates the
    * y-index manually (monomorphic inner loop — see EdgeIndex.forRange). */
  def locate(px: Int, py: Int, g: G): Int = {
    if (px < g.minX || px > g.maxX || py < g.minY || py > g.maxY) return OUT
    val idx = g.edgeIndexY
    val cs = g.coords
    val nx = g.nextIdx
    var crossings = 0
    var on = false
    // one edge visit, shared by both tiers
    def visit(e: Int): Boolean = { // returns true when the point is ON
      val j = nx(e)
      val ax = cs(2 * e); val ay = cs(2 * e + 1)
      val bx = cs(2 * j); val by = cs(2 * j + 1)
      if (onSeg(px, py, ax, ay, bx, by)) true
      // half-open rule: count crossings of the horizontal ray to +x
      else {
        if ((ay > py) != (by > py)) {
          // ray crosses iff edge x at y=py is > px, exact sign test
          val det = (bx - ax).toLong * (py - ay) - (by - ay).toLong * (px - ax)
          if (by > ay) { if (det > 0) crossings += 1 }
          else { if (det < 0) crossings += 1 }
        }
        false
      }
    }
    var k = 0
    val lIds = idx.longIds; val lMin = idx.longMin; val lMax = idx.longMax
    while (k < lIds.length && !on) {
      if (lMin(k) <= py && lMax(k) >= py) on = visit(lIds(k))
      k += 1
    }
    val minXs = idx.minXs; val order = idx.order
    var i = idx.lowerBound(py)
    while (i < minXs.length && minXs(i) <= py && !on) {
      on = visit(order(i))
      i += 1
    }
    if (on) ON
    else if ((crossings & 1) == 1) IN
    else OUT
  }
}

/** Edges of a G sorted by min-x with the maximum edge x-span, so a query
  * x-interval [lo,hi] scans only edges with minX in [lo - maxSpan, hi].
  */
final class EdgeIndex(
    val order: Array[Int],  // SHORT edge ids sorted by edge minX
    val minXs: Array[Int],  // sorted minX per order entry
    val maxSpan: Int,       // max span among SHORT edges
    val longIds: Array[Int],  // long-tail edge ids (scanned per query)
    val longMin: Array[Int],  // their min coord
    val longMax: Array[Int]) {

  /** Visit candidate edge ids whose x-range may overlap [lo,hi].
    *
    * Two tiers: a few long edges are checked directly (a single long edge
    * would otherwise inflate the search window of EVERY query by its whole
    * span); the short majority is answered by binary search with the small
    * residual span widening.
    *
    * Hot paths (walkVsArea's inner loop, locate's ray cast) iterate
    * MANUALLY via [[lowerBound]] + the public arrays instead of this
    * closure form: the call sites are megamorphic (several distinct
    * lambdas), so `f` never inlines and every visited edge pays a virtual
    * dispatch plus a closure allocation per query. */
  def forRange(lo: Int, hi: Int)(f: Int => Unit): Unit = {
    var k = 0
    while (k < longIds.length) {
      if (longMin(k) <= hi && longMax(k) >= lo) f(longIds(k))
      k += 1
    }
    var i = lowerBound(lo)
    while (i < minXs.length && minXs(i) <= hi) {
      f(order(i))
      i += 1
    }
  }

  /** First index into the short tier whose minX may overlap a query
    * starting at `lo` (i.e. minXs(i) >= lo - maxSpan). */
  def lowerBound(lo: Int): Int = {
    // degenerate no-skip index (EdgeIndex.enabled = false): every edge
    if (maxSpan == Int.MaxValue) return 0
    val from = (lo.toLong - maxSpan).max(Int.MinValue).toInt
    var a = 0; var b = minXs.length
    while (a < b) {
      val m = (a + b) >>> 1
      if (minXs(m) < from) a = m + 1 else b = m
    }
    a
  }
}

object EdgeIndex {
  private val EMPTY = new Array[Int](0)

  /** J8 kill switch (reference --no-fast-sweep-skip): when false, new
    * indexes degenerate to visit-every-edge — all mins at Int.MinValue
    * with an Int.MaxValue span, so lowerBound always answers 0 and no
    * range scan terminates early. Results are identical; every edge pays
    * the exact test. THREAD-local: each task thread sets it at partition
    * start (from SpatialConfig.useFastSweepSkip) and a geometry's index is
    * built on the thread that decodes it, so concurrent jobs with
    * different settings cannot race each other's builds. */
  private val enabledTL: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.TRUE)
  def enabled: Boolean = enabledTL.get()
  def enabled_=(v: Boolean): Unit = enabledTL.set(v)

  def build(g: Geo.G, xAxis: Boolean): EdgeIndex = {
    val n = g.edgeCount
    if (!enabled) {
      val order = Array.tabulate(n)(identity)
      val mins = Array.fill(n)(Int.MinValue)
      return new EdgeIndex(order, mins, Int.MaxValue, EMPTY, EMPTY, EMPTY)
    }
    // pass 1: spans, to pick the long-edge cutoff (4x mean, min 16)
    var spanSum = 0L
    var e = 0
    while (e < n) {
      val i = g.edgeP(e); val j = g.edgeQ(e)
      val a = if (xAxis) g.x(i) else g.y(i)
      val b = if (xAxis) g.x(j) else g.y(j)
      spanSum += math.abs(a.toLong - b)
      e += 1
    }
    val cutoff =
      if (n == 0) Int.MaxValue
      else math.max(16L, 4L * spanSum / n).min(Int.MaxValue).toInt
    // pass 2: count the long tail; only split when it is genuinely a tail
    var nLong = 0
    e = 0
    while (e < n) {
      val i = g.edgeP(e); val j = g.edgeQ(e)
      val a = if (xAxis) g.x(i) else g.y(i)
      val b = if (xAxis) g.x(j) else g.y(j)
      if (math.abs(a - b) > cutoff) nLong += 1
      e += 1
    }
    // the long tier is scanned LINEARLY on every query: keep it tiny (its
    // only job is to stop a handful of pathological long edges from
    // widening every binary-search window), else fall back to one tier
    val split = nLong > 0 && nLong <= 8 && nLong <= n / 8
    val effCut = if (split) cutoff else Int.MaxValue
    val nShort = if (split) n - nLong else n
    // pack (minC - Int.MinValue, edgeId) into one long per SHORT edge and
    // sort the primitive array — index construction runs on every
    // refine-cache miss, so no boxing
    val packed = new Array[Long](nShort)
    val lIds = if (split) new Array[Int](nLong) else EMPTY
    val lMin = if (split) new Array[Int](nLong) else EMPTY
    val lMax = if (split) new Array[Int](nLong) else EMPTY
    var maxSpan = 0
    var s = 0; var l = 0
    e = 0
    while (e < n) {
      val i = g.edgeP(e); val j = g.edgeQ(e)
      val a = if (xAxis) g.x(i) else g.y(i)
      val b = if (xAxis) g.x(j) else g.y(j)
      val mn = math.min(a, b)
      val span = math.abs(a - b)
      if (span > effCut) {
        lIds(l) = e; lMin(l) = mn; lMax(l) = math.max(a, b); l += 1
      } else {
        if (span > maxSpan) maxSpan = span
        // signed mn in the high 32 bits, edge id in the low 32: a plain
        // signed long sort orders by mn ascending. (The round-1 packing
        // biased mn by -Int.MinValue before the shift, which overflows the
        // sign bit: arrays mixing negative and non-negative coords sorted
        // [mn>=0..., mn<0...] and range scans could STOP before the
        // negative block — wrong results for any geometry straddling
        // coordinate zero. Caught by the EdgeIndexCheck brute-force probe.)
        packed(s) = (mn.toLong << 32) | (e.toLong & 0xffffffffL)
        s += 1
      }
      e += 1
    }
    java.util.Arrays.sort(packed, 0, s)
    val order = new Array[Int](nShort)
    val sortedMin = new Array[Int](nShort)
    var k = 0
    while (k < nShort) {
      val p = packed(k)
      order(k) = (p & 0xffffffffL).toInt
      sortedMin(k) = (p >> 32).toInt
      k += 1
    }
    new EdgeIndex(order, sortedMin, maxSpan, lIds, lMin, lMax)
  }
}
