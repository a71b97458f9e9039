package graft.geom

import scala.io.Source

object ScratchDebug {
  def main(args: Array[String]): Unit = {
    val lines = Source.fromFile(
      "/root/repo/src/test/resources/datasets/freiburg", "UTF-8")
      .getLines().toList
    val rows = lines.zipWithIndex.flatMap { case (l, i) =>
      Wkt.parseLine(l, i + 1)
    }
    def g(id: String) = rows.filter(_.gid == id).flatMap(_.subs).head
    val k = g("Kappel"); val h = g("Herdern")

    // find exact closest pair over segment pairs (double)
    var best = Double.MaxValue
    var bp: (Double, Double, Double, Double) = null
    for (e1 <- 0 until k.edgeCount; e2 <- 0 until h.edgeCount) {
      val (i1, j1) = (k.edgeP(e1), k.edgeQ(e1))
      val (i2, j2) = (h.edgeP(e2), h.edgeQ(e2))
      val (ax, ay, bx, by) = (k.x(i1).toDouble, k.y(i1).toDouble,
        k.x(j1).toDouble, k.y(j1).toDouble)
      val (cx, cy, dx, dy) = (h.x(i2).toDouble, h.y(i2).toDouble,
        h.x(j2).toDouble, h.y(j2).toDouble)
      // closest points via 4 point-seg projections
      def ps(px: Double, py: Double, sx: Double, sy: Double,
          tx: Double, ty: Double): (Double, Double, Double, Double, Double) = {
        val ddx = tx - sx; val ddy = ty - sy
        val l2 = ddx * ddx + ddy * ddy
        val t = if (l2 <= 0) 0.0
          else math.max(0.0, math.min(1.0, ((px - sx) * ddx + (py - sy) * ddy) / l2))
        val qx = sx + t * ddx; val qy = sy + t * ddy
        val vx = px - qx; val vy = py - qy
        (vx * vx + vy * vy, px, py, qx, qy)
      }
      for (c <- Seq(ps(ax, ay, cx, cy, dx, dy), ps(bx, by, cx, cy, dx, dy),
        ps(cx, cy, ax, ay, bx, by), ps(dx, dy, ax, ay, bx, by))) {
        if (c._1 < best) { best = c._1; bp = (c._2, c._3, c._4, c._5) }
      }
    }
    val (x1, y1, x2, y2) = bp
    println(s"closest pair int-space: ($x1,$y1) <-> ($x2,$y2) eucl=${math.sqrt(best)}")
    val PREC = 10.0
    def fact(y: Double): Double = Dist.distFactor(y)
    val eu = math.sqrt(best) / PREC
    println(s"euclid meters (merc): $eu")
    println(s"midpoint factor: ${eu * fact((y1 + y2) / 2 / PREC)}")
    println(s"avg factors:     ${eu * (fact(y1 / PREC) + fact(y2 / PREC)) / 2}")
    println(s"p1 factor:       ${eu * fact(y1 / PREC)}")
    println(s"p2 factor:       ${eu * fact(y2 / PREC)}")
    // float-precision variant: coords/PREC as Float first
    val fx1 = (x1 / PREC).toFloat; val fy1 = (y1 / PREC).toFloat
    val fx2 = (x2 / PREC).toFloat; val fy2 = (y2 / PREC).toFloat
    val feu = math.sqrt(((fx1 - fx2).toDouble * (fx1 - fx2) +
      (fy1 - fy2).toDouble * (fy1 - fy2)))
    println(s"float euclid: $feu")
    println(s"float + mid: ${feu * fact((fy1 + fy2) / 2)}")
    println(s"float + avg: ${feu * (fact(fy1) + fact(fy2)) / 2}")
    println(s"float + p1:  ${feu * fact(fy1)}")
    println(s"float + p2:  ${feu * fact(fy2)}")
    // int-snapped closest points
    val ix1 = math.round(x1); val iy1 = math.round(y1)
    val ix2 = math.round(x2); val iy2 = math.round(y2)
    val ieu = math.sqrt(((ix1 - ix2).toDouble * (ix1 - ix2) +
      (iy1 - iy2).toDouble * (iy1 - iy2))) / PREC
    println(s"int euclid: $ieu")
    println(s"int + mid: ${ieu * fact((iy1 + iy2) / 2.0 / PREC)}")
    println(s"int(floor) variants:")
    val gx1 = math.floor(x1); val gy1 = math.floor(y1)
    val gx2 = math.floor(x2); val gy2 = math.floor(y2)
    val geu = math.sqrt(((gx1 - gx2) * (gx1 - gx2) +
      (gy1 - gy2) * (gy1 - gy2))) / PREC
    println(s"floor + mid: ${geu * fact((gy1 + gy2) / 2 / PREC)}")
  }
}

object ScratchDebug2 {
  def main(args: Array[String]): Unit = {
    val lines = Source.fromFile(
      "/root/repo/src/test/resources/datasets/freiburg", "UTF-8")
      .getLines().toList
    val rows = lines.zipWithIndex.flatMap { case (l, i) =>
      Wkt.parseLine(l, i + 1)
    }
    def g(id: String) = rows.filter(_.gid == id).flatMap(_.subs).head
    val k = g("Kappel"); val h = g("Herdern")
    val PREC = 10.0
    var bestMid = Double.MaxValue
    var bestAvg = Double.MaxValue
    var bestP1 = Double.MaxValue
    for (e1 <- 0 until k.edgeCount; e2 <- 0 until h.edgeCount) {
      val (i1, j1) = (k.edgeP(e1), k.edgeQ(e1))
      val (i2, j2) = (h.edgeP(e2), h.edgeQ(e2))
      val (ax, ay, bx, by) = (k.x(i1).toDouble, k.y(i1).toDouble,
        k.x(j1).toDouble, k.y(j1).toDouble)
      val (cx, cy, dx, dy) = (h.x(i2).toDouble, h.y(i2).toDouble,
        h.x(j2).toDouble, h.y(j2).toDouble)
      def ps(px: Double, py: Double, sx: Double, sy: Double,
          tx: Double, ty: Double): (Double, Double, Double) = {
        val ddx = tx - sx; val ddy = ty - sy
        val l2 = ddx * ddx + ddy * ddy
        val t = if (l2 <= 0) 0.0
          else math.max(0.0, math.min(1.0, ((px - sx) * ddx + (py - sy) * ddy) / l2))
        val qx = sx + t * ddx; val qy = sy + t * ddy
        val vx = px - qx; val vy = py - qy
        (vx * vx + vy * vy, py, qy)
      }
      for (c <- Seq(ps(ax, ay, cx, cy, dx, dy), ps(bx, by, cx, cy, dx, dy),
        ps(cx, cy, ax, ay, bx, by), ps(dx, dy, ax, ay, bx, by))) {
        val eu = math.sqrt(c._1) / PREC
        val m1 = eu * Dist.distFactor((c._2 + c._3) / 2 / PREC)
        val m2 = eu * (Dist.distFactor(c._2 / PREC) + Dist.distFactor(c._3 / PREC)) / 2
        val m3 = eu * Dist.distFactor(c._2 / PREC)
        if (m1 < bestMid) bestMid = m1
        if (m2 < bestAvg) bestAvg = m2
        if (m3 < bestP1) bestP1 = m3
      }
    }
    println(s"minMeters mid=$bestMid avg=$bestAvg p1=$bestP1")
  }
}
