package graft.geom

import scala.collection.mutable.ArrayBuffer

/** WKT parsing in the reference's input dialect
  * (reference: src/spatialjoin/WKTParse.h:114-247):
  *
  *   line := [id \t [side \t]] ( WKT | '<' id ',' id ... '>' )
  *
  * Types: POINT, MULTIPOINT, LINESTRING, MULTILINESTRING, POLYGON (holes),
  * MULTIPOLYGON, GEOMETRYCOLLECTION (nested). Arbitrary internal whitespace
  * and lax comma/space separation are tolerated (numbers are consumed
  * sequentially and paired). lon/lat is projected to int32 web mercator
  * (WKTParse.h:107-111).
  */
object Wkt {

  /** One parsed input row. Exactly one of `subs` / `refs` is non-empty
    * unless the row is invalid (both empty => skip). */
  final case class Row(
      gid: String,
      side: Int,
      subs: Array[Geo.G], // decomposed single geometries
      refs: Array[String]) // alias targets if this row is a <ref,...>

  /** Parse one input line (id \t side \t wkt). `lineNo` is the 1-based
    * default id; `defaultSide` is used when the line has no side field —
    * the reference passes the input-file index as this default and lets
    * an explicit 3-field line override it (WKTParse.h:139 `side =
    * atoi(c)`), so annotated lines inside two-file inputs keep their
    * authored sides. */
  def parseLine(line: String, lineNo: Long, defaultSide: Int = 0)
      : Option[Row] = {
    if (line.isEmpty) return None
    val t1 = line.indexOf('\t')
    var gid = lineNo.toString
    var side = defaultSide
    var geomStr = line
    if (t1 >= 0) {
      gid = line.substring(0, t1)
      geomStr = line.substring(t1 + 1)
      val t2 = geomStr.indexOf('\t')
      if (t2 >= 0) {
        // a second tab means the middle field IS the side (WKT and <ref>
        // payloads never contain tabs); non-numeric parses as 0 like atoi,
        // and any non-zero value collapses to 1 like the reference's
        // `bool side = atoi(c)` (WKTParse.h:23,139) — the engine packs
        // side into one bit, so wider values must never reach the kernel
        side =
          if (geomStr.substring(0, t2).trim.toIntOption.getOrElse(0) != 0) 1
          else 0
        geomStr = geomStr.substring(t2 + 1)
      }
    }
    val g = geomStr.trim
    if (g.isEmpty) None
    else if (g.charAt(0) == '<') {
      val inner = g.substring(1, math.max(1, g.lastIndexOf('>')))
      val refs = inner.split(',').map(_.trim).filter(_.nonEmpty)
      Some(Row(gid, side, Array.empty, refs))
    } else {
      val subs = parseWkt(g)
      if (subs.isEmpty) None else Some(Row(gid, side, subs, Array.empty))
    }
  }

  /** Parse a WKT string into decomposed single geometries. */
  def parseWkt(s: String): Array[Geo.G] = {
    val out = ArrayBuffer.empty[Geo.G]
    parseInto(s, 0, s.length, out)
    out.toArray
  }

  private def parseInto(s: String, from: Int, to: Int,
      out: ArrayBuffer[Geo.G]): Unit = {
    var i = from
    while (i < to && s.charAt(i).isWhitespace) i += 1
    if (i >= to) return
    val up = s
    def matches(kw: String): Boolean =
      up.regionMatches(true, i, kw, 0, kw.length)

    if (matches("GEOMETRYCOLLECTION")) {
      val open = s.indexOf('(', i)
      if (open < 0) return
      val close = matchParen(s, open, to)
      // split top-level elements by commas at depth 0 and recurse
      var start = open + 1
      var depth = 0
      var j = open + 1
      while (j < close) {
        val c = s.charAt(j)
        if (c == '(') depth += 1
        else if (c == ')') depth -= 1
        else if (c == ',' && depth == 0) {
          parseInto(s, start, j, out); start = j + 1
        }
        j += 1
      }
      parseInto(s, start, close, out)
    } else if (matches("MULTIPOLYGON")) {
      val open = s.indexOf('(', i)
      if (open < 0) return
      val close = matchParen(s, open, to)
      // polygons are themselves parenthesized groups at depth 1
      foreachGroup(s, open + 1, close) { (a, b) =>
        val rings = ringGroups(s, a, b)
        if (rings.nonEmpty) out += Geo.G.polygon(rings)
      }
    } else if (matches("POLYGON")) {
      val open = s.indexOf('(', i)
      if (open < 0) return
      val close = matchParen(s, open, to)
      val rings = ringGroups(s, open + 1, close)
      if (rings.nonEmpty) out += Geo.G.polygon(rings)
    } else if (matches("MULTILINESTRING")) {
      val open = s.indexOf('(', i)
      if (open < 0) return
      val close = matchParen(s, open, to)
      foreachGroup(s, open + 1, close) { (a, b) =>
        val cs = numbersToCoords(s, a, b)
        if (cs.length >= 4) out += Geo.G.line(cs)
      }
    } else if (matches("LINESTRING")) {
      val open = s.indexOf('(', i)
      if (open < 0) return
      val close = matchParen(s, open, to)
      val cs = numbersToCoords(s, open + 1, close)
      if (cs.length >= 4) out += Geo.G.line(cs)
    } else if (matches("MULTIPOINT")) {
      val open = s.indexOf('(', i)
      if (open < 0) return
      val close = matchParen(s, open, to)
      // both MULTIPOINT(1 1, 2 2) and MULTIPOINT((1 1),(2 2))
      val cs = numbersToCoords(s, open + 1, close)
      var k = 0
      while (k + 1 < cs.length / 2 * 2) {
        out += Geo.G.point(cs(k), cs(k + 1))
        k += 2
      }
    } else if (matches("POINT")) {
      val open = s.indexOf('(', i)
      if (open < 0) return
      val close = matchParen(s, open, to)
      val cs = numbersToCoords(s, open + 1, close)
      if (cs.length >= 2) out += Geo.G.point(cs(0), cs(1))
    }
  }

  /** index of the ')' matching the '(' at `open` (or `to`-1 fallback). */
  private def matchParen(s: String, open: Int, to: Int): Int = {
    var depth = 0
    var j = open
    while (j < to) {
      val c = s.charAt(j)
      if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) return j }
      j += 1
    }
    to - 1
  }

  /** Iterate over top-level parenthesized groups in s[from,to); f receives
    * each group's CONTENT bounds (inside its parens). */
  private def foreachGroup(s: String, from: Int, to: Int)(
      f: (Int, Int) => Unit): Unit = {
    var j = from
    while (j < to) {
      if (s.charAt(j) == '(') {
        val e = matchParen(s, j, to)
        f(j + 1, e)
        j = e + 1
      } else j += 1
    }
  }

  /** Rings of a POLYGON body given content bounds s[from,to). */
  private def ringGroups(s: String, from: Int, to: Int): Array[Array[Int]] = {
    val rings = ArrayBuffer.empty[Array[Int]]
    foreachGroup(s, from, to) { (a, b) =>
      val cs = numbersToCoords(s, a, b)
      if (cs.length >= 6) rings += cs
    }
    if (rings.isEmpty) { // unparenthesized single ring (lax)
      val cs = numbersToCoords(s, from, to)
      if (cs.length >= 6) rings += cs
    }
    rings.toArray
  }

  /** All numeric tokens in s[from,to), paired sequentially (lon lat) and
    * projected to int web mercator. Lax about separators: any run of
    * number-chars is one token. */
  private def numbersToCoords(s: String, from: Int, to: Int): Array[Int] = {
    val nums = ArrayBuffer.empty[Double]
    var j = from
    while (j < to) {
      val c = s.charAt(j)
      if (c == '-' || c == '+' || c == '.' || (c >= '0' && c <= '9')) {
        val start = j
        j += 1
        var done = false
        while (j < to && !done) {
          val d = s.charAt(j)
          val isNum = d == '.' || (d >= '0' && d <= '9') || d == 'e' ||
            d == 'E' || ((d == '-' || d == '+') &&
              (s.charAt(j - 1) == 'e' || s.charAt(j - 1) == 'E'))
          if (isNum) j += 1 else done = true
        }
        try nums += java.lang.Double.parseDouble(s.substring(start, j))
        catch { case _: NumberFormatException => () }
      } else j += 1
    }
    val nPairs = nums.length / 2
    val cs = new Array[Int](nPairs * 2)
    var k = 0
    while (k < nPairs) {
      cs(2 * k) = Geo.projX(nums(2 * k))
      cs(2 * k + 1) = Geo.projY(nums(2 * k + 1))
      k += 1
    }
    cs
  }
}
