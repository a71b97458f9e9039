package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.geom.Geo

/** In-repo twin of the sp_rect_relate DuckDB oracle: the engine's full
  * pipeline output on the deterministic rectangle set must equal, as a
  * MULTISET (the driver's compare hashes sorted rows, so duplicates
  * count), a driver-side closed-form evaluation over the identically
  * projected int boxes. Axis-aligned rectangles make every predicate a
  * closed interval formula; the derivation is documented at
  * [[SpatialQueries.spRectRelate]].
  */
class RectRelateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("rect-relate")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sfDir: Option[String] =
    Seq("sf0.001", "sf0.01").map(s => s"/root/testdata/$s")
      .find(d => new java.io.File(s"$d/orders.parquet").exists())

  private case class Box(gid: Long, cell: Int,
      x1: Long, y1: Long, x2: Long, y2: Long)

  private def boxesOf(gids: Seq[Long]): Seq[Box] = {
    val dx1 = Array(0, 1, 2, 4, 0, 3); val dy1 = Array(0, 1, 1, 0, 0, 2)
    val dx2 = Array(4, 3, 6, 6, 4, 6); val dy2 = Array(3, 2, 4, 3, 3, 4)
    gids.map { gid =>
      val cell = ((gid / 6) % 960).toInt
      val v = (gid % 6).toInt
      val bx = cell % 40 * 8 - 160
      val by = cell / 40 * 5 - 60
      Box(gid, cell,
        Geo.projX((bx + dx1(v)).toDouble).toLong,
        Geo.projY((by + dy1(v)).toDouble).toLong,
        Geo.projX((bx + dx2(v)).toDouble).toLong,
        Geo.projY((by + dy2(v)).toDouble).toLong)
    }
  }

  /** Intersecting ordered pairs fed to a per-pair row builder. */
  private def foreachPair(gids: Seq[Long])(f: (Box, Box) => Unit): Unit =
    for (group <- boxesOf(gids).groupBy(_.cell).values; a <- group;
         b <- group if a.gid != b.gid
         if a.x1 <= b.x2 && b.x1 <= a.x2 && a.y1 <= b.y2 && b.y1 <= a.y2)
      f(a, b)

  private def covers(a: Box, b: Box): Boolean =
    a.x1 <= b.x1 && b.x2 <= a.x2 && a.y1 <= b.y1 && b.y2 <= a.y2

  private def interiorsOverlap(a: Box, b: Box): Boolean =
    math.max(a.x1, b.x1) < math.min(a.x2, b.x2) &&
      math.max(a.y1, b.y1) < math.min(a.y2, b.y2)

  /** Closed-form expected relations for one gid set (driver-side). */
  private def expected(gids: Seq[Long]): Seq[String] = {
    val out = Seq.newBuilder[String]
    foreachPair(gids) { (a, b) =>
      def row(p: String) = out += s"${a.gid}\t$p\t${b.gid}"
      row("intersects")
      val covAB = covers(a, b); val covBA = covers(b, a)
      val ii = interiorsOverlap(a, b)
      if (covAB) { row("covers"); row("contains") }
      if (a.x1 == b.x1 && a.x2 == b.x2 && a.y1 == b.y1 && a.y2 == b.y2)
        row("equals")
      if (!ii) row("touches")
      if (ii && !covAB && !covBA) row("overlaps")
    }
    out.result()
  }

  /** Closed-form expected DE-9IM matrices (derivation documented at
    * [[SpatialQueries.spRectDe9im]]). */
  private def expectedDe9im(gids: Seq[Long]): Seq[String] = {
    val out = Seq.newBuilder[String]
    foreachPair(gids) { (a, b) =>
      def edgeInInterior(edge: Box, in: Box): Boolean = {
        val xOverlap = math.max(a.x1, b.x1) < math.min(a.x2, b.x2)
        val yOverlap = math.max(a.y1, b.y1) < math.min(a.y2, b.y2)
        ((in.x1 < edge.x1 && edge.x1 < in.x2) ||
          (in.x1 < edge.x2 && edge.x2 < in.x2)) && yOverlap ||
        ((in.y1 < edge.y1 && edge.y1 < in.y2) ||
          (in.y1 < edge.y2 && edge.y2 < in.y2)) && xOverlap
      }
      val sharedEdge =
        ((a.x1 == b.x1 || a.x1 == b.x2 || a.x2 == b.x1 || a.x2 == b.x2) &&
          math.max(a.y1, b.y1) < math.min(a.y2, b.y2)) ||
        ((a.y1 == b.y1 || a.y1 == b.y2 || a.y2 == b.y1 || a.y2 == b.y2) &&
          math.max(a.x1, b.x1) < math.min(a.x2, b.x2))
      val strictIn =
        (b.x1 < a.x1 && a.x2 < b.x2 && b.y1 < a.y1 && a.y2 < b.y2) ||
        (a.x1 < b.x1 && b.x2 < a.x2 && a.y1 < b.y1 && b.y2 < a.y2)
      val covAB = covers(a, b); val covBA = covers(b, a)
      val m = new StringBuilder
      m += (if (interiorsOverlap(a, b)) '2' else 'F') // II
      m += (if (edgeInInterior(b, a)) '1' else 'F') // IB
      m += (if (covBA) 'F' else '2') // IE
      m += (if (edgeInInterior(a, b)) '1' else 'F') // BI
      m += (if (sharedEdge) '1' else if (strictIn) 'F' else '0') // BB
      m += (if (covBA) 'F' else '1') // BE
      m += (if (covAB) 'F' else '2') // EI
      m += (if (covAB) 'F' else '1') // EB
      m += '2' // EE
      out += s"${a.gid}\t$m\t${b.gid}"
    }
    out.result()
  }

  private def gidsOf(dir: String): Seq[Long] =
    graft.Tables.parquet(spark, s"$dir/orders.parquet")
      .select(org.apache.spark.sql.functions.col("o_orderkey").cast("long"))
      .filter(org.apache.spark.sql.functions.col("o_orderkey") <= 30000)
      .collect().map(_.getLong(0)).toSeq

  test("engine rect relations == closed-form box logic (multiset)") {
    val dir = sfDir
    assume(dir.isDefined, "driver testdata not present")
    val got = SpatialQueries.spRectRelate(spark, dir.get)
      .collect().map(r => s"${r.getLong(0)}\t${r.getString(1)}\t${r.getLong(2)}")
    val want = expected(gidsOf(dir.get))
    assert(got.sorted.toSeq == want.sorted,
      s"got ${got.length} rows, want ${want.length}")
    // the fixture must actually manufacture every area/area predicate
    val preds = got.map(_.split("\t")(1)).toSet
    assert(preds == Set("intersects", "covers", "contains", "equals",
      "touches", "overlaps"), s"predicates seen: $preds")
  }

  test("engine rect DE-9IM matrices == closed-form box logic (multiset)") {
    val dir = sfDir
    assume(dir.isDefined, "driver testdata not present")
    val got = SpatialQueries.spRectDe9im(spark, dir.get)
      .collect().map(r => s"${r.getLong(0)}\t${r.getString(1)}\t${r.getLong(2)}")
    val want = expectedDe9im(gidsOf(dir.get))
    assert(got.sorted.toSeq == want.sorted,
      s"got ${got.length} rows, want ${want.length}; " +
        s"sample diff: ${(got.toSet -- want.toSet).take(3)} / " +
        s"${(want.toSet -- got.toSet).take(3)}")
    // matrix variety: equal, strict-contains, edge-touch, corner-touch,
    // overlap shapes must all appear
    val mats = got.map(_.split("\t")(1)).toSet
    for (m <- Seq("2FFF1FFF2", "212FF1FF2", "FF2F11212", "FF2F01212"))
      assert(mats.contains(m), s"expected matrix $m in output; got $mats")
  }

  test("engine rect distances == corner-pair metersPairD (multiset)") {
    val dir = sfDir
    assume(dir.isDefined, "driver testdata not present")
    val got = SpatialQueries.spRectDist(spark, dir.get)
      .collect()
      .map(r => s"${r.getLong(0)}\t${r.getLong(1)}\t${r.getDouble(2)}")
    // closed-form: same (cell,v) pairs are exact duplicates (0); cross
    // variants have a provably unique corner-to-corner closest approach
    case class B(gid: Long, cell: Int, v: Int,
        x1: Long, y1: Long, x2: Long, y2: Long)
    val bs = gidsOf(dir.get).map { gid =>
      val cell = ((gid / 2) % 960).toInt; val v = (gid % 2).toInt
      val bx = cell % 40 * 8 - 160 + (if (v == 0) 0 else 2)
      val by = cell / 40 * 5 - 60 + (if (v == 0) 0 else 2)
      B(gid, cell, v,
        Geo.projX(bx.toDouble).toLong, Geo.projY(by.toDouble).toLong,
        Geo.projX((bx + 1).toDouble).toLong, Geo.projY((by + 1).toDouble).toLong)
    }
    val want = for (g <- bs.groupBy(_.cell).values.toSeq; a <- g; b <- g
                    if a.gid < b.gid) yield {
      val d =
        if (a.v == b.v) 0.0
        else if (a.v == 0) graft.geom.Dist.metersPairD(
          a.x2.toDouble, a.y2.toDouble, b.x1.toDouble, b.y1.toDouble)
        else graft.geom.Dist.metersPairD(
          a.x1.toDouble, a.y1.toDouble, b.x2.toDouble, b.y2.toDouble)
      s"${a.gid}\t${b.gid}\t${BigDecimal(d)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble}"
    }
    assert(got.sorted.toSeq == want.sorted,
      s"got ${got.length} rows, want ${want.length}; sample: " +
        s"${(got.toSet -- want.toSet).take(3)} / ${(want.toSet -- got.toSet).take(3)}")
    // duplicate pairs need two gids 1920 apart in the same (cell, v) —
    // present from sf0.01 up, absent in the 1500-gid sf0.001 set
    if (bs.map(_.gid).max >= 1920)
      assert(got.exists(_.endsWith("\t0.0")), "duplicate pairs must report 0")
    assert(got.exists(!_.endsWith("\t0.0")), "corner pairs must be nonzero")
  }

  test("refs to MULTI-part targets: distributed fanout == driver closure, " +
      "nonzero distances inherited (r4 expandAuthoredRefs fix)") {
    val s = spark
    // self-contained diagonal-ladder cells: v0/v1 two-part MULTIPOLYGONs,
    // v2 = <v0>, v3 = <v0, v1> (the exact shape whose alias inheritance
    // was silently empty before expandAuthoredRefs)
    def ring(bx: Int, by: Int, o: Double, e: Double) =
      s"((${bx + o} ${by + o}, ${bx + e} ${by + o}, ${bx + e} ${by + e}, " +
        s"${bx + o} ${by + e}, ${bx + o} ${by + o}))"
    val lines = (0 until 12).flatMap { c =>
      val bx = c * 8 - 40; val by = (c % 3) * 5 - 10
      val g = c * 4
      Seq(
        s"$g\tMULTIPOLYGON(${ring(bx, by, 0, 0.5)}, ${ring(bx, by, 2, 2.5)})",
        s"${g + 1}\tMULTIPOLYGON(${ring(bx, by, 1, 1.5)}, ${ring(bx, by, 3, 3.5)})",
        s"${g + 2}\t<$g>",
        s"${g + 3}\t<$g, ${g + 1}>")
    }
    val (geoms, refs) = Model.parseLines(s,
      s.createDataset(lines)(org.apache.spark.sql.Encoders.STRING))
    val gc = geoms.cache(); val rc = refs.cache()
    try for (cfg <- Seq(
        SpatialConfig(mode = "distance", withinDist = 120000.0),
        SpatialConfig())) {
      def rels(c: SpatialConfig): Seq[(String, String, String)] = {
        val mid =
          if (c.mode == "distance") "cast(dist as string)" else "predicate"
        SpatialJoin.run(s, gc, rc, c).selectExpr("a_id", mid, "b_id")
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getString(2)))
          .toSeq.sorted
      }
      val driver = rels(cfg)
      val dist = rels(cfg.copy(maxDriverEdges = 0))
      assert(driver.nonEmpty && driver == dist,
        s"${cfg.mode}: driver=${driver.size} distributed=${dist.size} " +
          s"diff=${(driver.toSet -- dist.toSet).take(3)} " +
          s"${(dist.toSet -- driver.toSet).take(3)}")
      if (cfg.mode == "distance")
        assert(driver.exists { case (a, d, b) =>
          (a.toLong % 4 >= 2 || b.toLong % 4 >= 2) && d.toDouble > 1000.0
        }, "no nonzero alias-inherited distance found (the r4 bug)")
    } finally { gc.unpersist(); rc.unpersist() }
  }
}
