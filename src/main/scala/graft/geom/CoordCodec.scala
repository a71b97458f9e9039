package graft.geom

import org.apache.spark.sql.catalyst.util.ArrayData

/** Delta-varint codec for geometry payloads in the kernel shuffle.
  *
  * Web-mercator int32 coordinates are high-entropy in their low bytes, so
  * lz4 leaves them ~incompressible and coords are ~60% of the cell-shuffle
  * bytes. Consecutive vertices are near each other, so zigzag-encoded
  * per-axis deltas fit in 2-3 varint bytes instead of 8 per vertex —
  * roughly a 3x cut on line/polygon payloads. Encoding runs once per cover
  * row inside the exchange projection (see SpatialJoin.fusedPairs);
  * decoding once per kernel row in makeRef.
  *
  * Layout: varint nCoords, then per vertex zigzag-varint dx,dy (deltas vs
  * the previous vertex; the first vertex is a delta vs 0), then varint
  * nRings and ascending ring ends as deltas vs the previous end.
  */
object CoordCodec {

  private def varintSize(v0: Long): Int = {
    var v = v0; var n = 1
    while ((v & ~0x7fL) != 0) { v >>>= 7; n += 1 }
    n
  }

  private def writeVarint(buf: Array[Byte], pos0: Int, v0: Long): Int = {
    var v = v0; var pos = pos0
    while ((v & ~0x7fL) != 0) {
      buf(pos) = ((v & 0x7f) | 0x80).toByte; pos += 1; v >>>= 7
    }
    buf(pos) = v.toByte
    pos + 1
  }

  @inline private def zigzag(v: Int): Long = ((v.toLong << 1) ^ (v >> 31)) & 0xffffffffL

  /** Called from generated code (SpatialJoin.EncodeGeom) and tests. */
  def encodeAD(coords: ArrayData, rings: ArrayData): Array[Byte] =
    encode(coords.toIntArray(), rings.toIntArray())

  def encode(coords: Array[Int], rings: Array[Int]): Array[Byte] = {
    var size = varintSize(coords.length) + varintSize(rings.length)
    var px = 0; var py = 0
    var i = 0
    while (i < coords.length) {
      size += varintSize(zigzag(coords(i) - px))
      size += varintSize(zigzag(coords(i + 1) - py))
      px = coords(i); py = coords(i + 1)
      i += 2
    }
    var pr = 0
    i = 0
    while (i < rings.length) {
      size += varintSize((rings(i) - pr).toLong)
      pr = rings(i); i += 1
    }
    val out = new Array[Byte](size)
    var pos = writeVarint(out, 0, coords.length)
    px = 0; py = 0; i = 0
    while (i < coords.length) {
      pos = writeVarint(out, pos, zigzag(coords(i) - px))
      pos = writeVarint(out, pos, zigzag(coords(i + 1) - py))
      px = coords(i); py = coords(i + 1)
      i += 2
    }
    pos = writeVarint(out, pos, rings.length)
    pr = 0; i = 0
    while (i < rings.length) {
      pos = writeVarint(out, pos, (rings(i) - pr).toLong)
      pr = rings(i); i += 1
    }
    out
  }

  /** Decodes into freshly allocated (coords, ringEnds). Flat loops — a
    * nested reader def would box the cursor into an IntRef on the kernel
    * hot path. */
  def decode(b: Array[Byte]): (Array[Int], Array[Int]) = {
    var pos = 0
    var v = 0L; var shift = 0; var x = 0
    do { x = b(pos); pos += 1; v |= (x & 0x7fL) << shift; shift += 7 }
    while ((x & 0x80) != 0)
    val nc = v.toInt
    val coords = new Array[Int](nc)
    var px = 0; var py = 0
    var i = 0
    while (i < nc) {
      v = 0L; shift = 0
      do { x = b(pos); pos += 1; v |= (x & 0x7fL) << shift; shift += 7 }
      while ((x & 0x80) != 0)
      px += ((v >>> 1) ^ -(v & 1)).toInt
      v = 0L; shift = 0
      do { x = b(pos); pos += 1; v |= (x & 0x7fL) << shift; shift += 7 }
      while ((x & 0x80) != 0)
      py += ((v >>> 1) ^ -(v & 1)).toInt
      coords(i) = px; coords(i + 1) = py
      i += 2
    }
    v = 0L; shift = 0
    do { x = b(pos); pos += 1; v |= (x & 0x7fL) << shift; shift += 7 }
    while ((x & 0x80) != 0)
    val nr = v.toInt
    val rings = new Array[Int](nr)
    var pr = 0
    i = 0
    while (i < nr) {
      v = 0L; shift = 0
      do { x = b(pos); pos += 1; v |= (x & 0x7fL) << shift; shift += 7 }
      while ((x & 0x80) != 0)
      pr += v.toInt; rings(i) = pr; i += 1
    }
    (coords, rings)
  }
}
