package graft.geom

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Model, SynthGeo}

/** Property checks over synthetic geometry pairs (no Spark session):
  * symmetry and internal-consistency invariants the kernel must satisfy
  * for EVERY pair, not just the fixtures.
  */
class RelatePropertySpec extends AnyFunSuite {

  // nearby pairs (same synthetic town) are the realistic candidate mix:
  // dense bbox overlaps across every kind combination
  private lazy val pairs: Seq[(Geo.G, Geo.G)] = {
    val geoms = (0 until 30000).map(i => SynthGeo.make(7L, i.toLong)).toArray
    // bbox-overlapping pairs via an x-sorted window scan — the same
    // candidate mix the join's cell shuffle would produce
    val sorted = geoms.sortBy(_.minX)
    val out = Seq.newBuilder[(Geo.G, Geo.G)]
    for (i <- sorted.indices; j <- (i + 1) until math.min(i + 40, sorted.length)) {
      val a = sorted(i); val b = sorted(j)
      if (a.minX <= b.maxX && b.minX <= a.maxX &&
          a.minY <= b.maxY && b.minY <= a.maxY)
        out += ((Model.toG(a.kind, a.coords, a.ringEnds),
          Model.toG(b.kind, b.coords, b.ringEnds)))
    }
    out.result()
  }

  test("relate(a,b) is the exact mirror of relate(b,a)") {
    // guards the smaller-boundary-first dispatch and every early-exit
    // branch in areaArea/lineArea: the relation must not depend on
    // argument order beyond the directional field swap
    var checked = 0
    for ((a, b) <- pairs) {
      val ab = Relate.relate(a, b)
      val ba = Relate.relate(b, a)
      assert(ab.isect == ba.isect, s"isect asym at pair $checked")
      assert(ab.aCovByB == ba.bCovByA && ab.bCovByA == ba.aCovByB,
        s"cov asym at pair $checked")
      assert(ab.aContInB == ba.bContInA && ab.bContInA == ba.aContInB,
        s"cont asym at pair $checked")
      assert(ab.touches == ba.touches, s"touches asym at pair $checked")
      assert(ab.overlaps == ba.overlaps, s"overlaps asym at pair $checked")
      assert(ab.interiorIsect == ba.interiorIsect,
        s"interiorIsect asym at pair $checked")
      checked += 1
    }
    assert(checked > 2000, s"only $checked pairs — generator drifted?")
  }

  test("PairRel internal implications hold on every pair") {
    for ((a, b) <- pairs) {
      val r = Relate.relate(a, b)
      // containment implies coverage implies intersection
      assert(!r.aContInB || r.aCovByB)
      assert(!r.bContInA || r.bCovByA)
      assert(!(r.aCovByB || r.bCovByA) || r.isect)
      // touches and interior intersection are exclusive by definition
      assert(!(r.touches && r.interiorIsect))
      // overlaps excludes coverage either way
      assert(!r.overlaps || (!r.aCovByB && !r.bCovByA))
      // any positive relation implies intersection
      assert(!(r.touches || r.overlaps || r.crosses) || r.isect)
    }
  }

  test("de9im matrix agrees with the predicate kernel on intersecting pairs") {
    var checked = 0
    for ((a, b) <- pairs) {
      val r = Relate.relate(a, b)
      if (r.isect) {
        val m = Relate.de9im(a, b)
        // II cell nonempty == interiors intersect (lines/areas; for point
        // kinds the interior is the point itself)
        assert((m(0) >= 0) == r.interiorIsect,
          s"II=${m(0)} vs interiorIsect=${r.interiorIsect} " +
            s"kinds=${a.kind}${b.kind} at $checked")
        // matrix transpose must equal the swapped evaluation
        val mT = Relate.de9im(b, a)
        assert(Relate.matToString(Relate.transpose(m)) ==
          Relate.matToString(mT), s"transpose mismatch at $checked")
        checked += 1
      }
    }
    assert(checked > 200, s"only $checked intersecting pairs")
  }
}
