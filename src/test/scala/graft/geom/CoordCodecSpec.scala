package graft.geom

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.SynthGeo

/** Round-trip property for the kernel-shuffle payload codec. */
class CoordCodecSpec extends AnyFunSuite {

  test("encode/decode round-trips synthetic geometries exactly") {
    for (i <- 0 until 5000) {
      val g = SynthGeo.make(99L, i.toLong)
      val sub = g
      val enc = CoordCodec.encode(sub.coords, sub.ringEnds)
      val (cs, re) = CoordCodec.decode(enc)
      assert(cs.sameElements(sub.coords), s"coords mismatch at $i")
      assert(re.sameElements(sub.ringEnds), s"ringEnds mismatch at $i")
    }
  }

  test("round-trips extreme and negative coordinates") {
    val cases = Seq(
      (Array(0, 0), Array.empty[Int]),
      (Array(Int.MinValue + 1, Int.MaxValue - 1,
        Int.MaxValue - 1, Int.MinValue + 1), Array(2)),
      (Array(-5, -7, -5, -7, 1000000000, -1000000000), Array(2, 3)),
      (Array(715827882, -715827882, -715827882, 715827882), Array(2)))
    for (((cs0, re0), i) <- cases.zipWithIndex) {
      val (cs, re) = CoordCodec.decode(CoordCodec.encode(cs0, re0))
      assert(cs.sameElements(cs0), s"case $i coords")
      assert(re.sameElements(re0), s"case $i rings")
    }
  }

  test("payload shrinks on realistic lines and polygons") {
    var raw = 0L; var packed = 0L
    for (i <- 0 until 3000) {
      val g = SynthGeo.make(5L, i.toLong)
      if (g.kind != 0) {
        raw += 4L * g.coords.length
        packed += CoordCodec.encode(g.coords, g.ringEnds).length
      }
    }
    // measured ~1.9x on the OSM-like mix (most deltas need 2 bytes/axis)
    assert(packed < raw * 6 / 10, s"packed=$packed raw=$raw")
  }
}
