package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.geom.{Dist, Geo, Relate}

/** Engine configuration (role of the reference's SweeperCfg,
  * reference: src/spatialjoin/Sweeper.h:184-212). */
final case class SpatialConfig(
    mode: String = "predicates", // predicates | de9im | distance
    withinDist: Double = -1.0,
    selfJoin: Boolean = true,
    /** geometries covering more than this many grid cells join from the
      * broadcast side instead of exploding (planet-polygon path; the
      * reference routes these to a shared `large` cache slot,
      * Sweeper.h:223). */
    bigCellThreshold: Int = 64,
    /** override the adaptive cell size (int coords); <=0 = adaptive. */
    cellSize: Long = -1L)

/** Per-sub-pair refinement output (the staging records of the reference's
  * write* calls, Sweeper.cpp:3579-3955, re-expressed as data). */
final case class FlagRow(
    gidA: String, subA: Int, nA: Int, kindA: Int,
    gidB: String, subB: Int, nB: Int, kindB: Int,
    isect: Boolean,
    covAbyB: Boolean, covBbyA: Boolean,
    contAinB: Boolean, contBinA: Boolean,
    subEq: Boolean,
    touch: Boolean, notTouch: Boolean,
    llCross: Boolean,
    laCrossAB: Boolean, // line A crosses area B
    laCrossBA: Boolean, // line B crosses area A
    overlap: Boolean,
    de9im: String, // 9 chars, "" unless de9im mode
    dist: Double) // meters, -1 unless distance mode

/** Spark-native spatial join: grid-cell candidate generation
  * (equi-join shuffle on cell), exact refinement in mapPartitions over the
  * typed Dataset, and relation aggregation reproducing the reference's
  * multi-geometry semantics (reference: Sweeper.cpp:788-1059).
  */
object SpatialJoin {

  import Geo.WORLD_W

  /** Pick a cell size so a typical sub-geometry covers ~1 cell: 4x the mean
    * bbox extent (measured on the mode-padded bboxes), clamped. One tiny
    * agg job; the result only affects performance, never results. */
  def adaptiveCellSize(padded: DataFrame, distMode: Boolean = false): Long = {
    val row = padded.agg(
      avg(greatest(col("maxX") - col("minX"), col("maxY") - col("minY"))
        .cast("double"))).head()
    val meanExtent = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
    // distance mode: the pad dominates every bbox, so cells of ~the padded
    // extent give the classic fixed-radius-neighbor grid (cells of ~4x the
    // padded extent pack O(n^2) candidate pairs per cell for no gain)
    val mult = if (distMode) 1.0 else 4.0
    val target = math.max(meanExtent * mult, WORLD_W / (1L << 24).toDouble)
    math.min(math.max(target.toLong, 16L), (WORLD_W / 4.0).toLong)
  }

  /** Candidate sub-geometry pairs: cell equi-join for ordinary geometries,
    * broadcast bbox join for cell-cover giants, each pair exactly once. */
  def candidates(spark: SparkSession, geoms: Dataset[SubGeom],
      cfg: SpatialConfig): DataFrame = {
    import spark.implicits._

    // Only ids + bboxes enter the cell machinery; materialized once so the
    // (possibly expensive) source is not re-executed by every join branch.
    val skinnyBase = geoms.toDF().select(col("gid"), col("side"),
      col("subId"), col("minX"), col("minY"), col("maxX"), col("maxY"))

    // within-distance mode: pad each bbox by dist/2 * worst-case scale
    // (reference getPaddedBoundingBox, Sweeper.h:350-388)
    val padded =
      if (cfg.withinDist >= 0) {
        val padFor = udf { (minY: Int, maxY: Int) =>
          val f = math.max(
            1.0 / Dist.distFactor(minY / Geo.PREC),
            1.0 / Dist.distFactor(maxY / Geo.PREC))
          math.ceil((cfg.withinDist / 2.0) * f * Geo.PREC).toInt
        }
        skinnyBase
          .withColumn("pad", padFor(col("minY"), col("maxY")))
          .withColumn("minX", col("minX") - col("pad"))
          .withColumn("minY", col("minY") - col("pad"))
          .withColumn("maxX", col("maxX") + col("pad"))
          .withColumn("maxY", col("maxY") + col("pad"))
          .drop("pad")
      } else skinnyBase

    val paddedP = padded
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val cs = if (cfg.cellSize > 0) cfg.cellSize
      else adaptiveCellSize(paddedP, distMode = cfg.withinDist >= 0)
    if (sys.env.contains("GRAFT_DEBUG")) {
      val w2 = WORLD_W / 2
      val dbg = paddedP.agg(
        count(lit(1)),
        sum(when((floor((col("maxX") + lit(w2)) / cs) -
          floor((col("minX") + lit(w2)) / cs) + 1) *
          (floor((col("maxY") + lit(w2)) / cs) -
            floor((col("minY") + lit(w2)) / cs) + 1) >
          cfg.bigCellThreshold, 1L).otherwise(0L)),
        sum((floor((col("maxX") + lit(w2)) / cs) -
          floor((col("minX") + lit(w2)) / cs) + 1) *
          (floor((col("maxY") + lit(w2)) / cs) -
            floor((col("minY") + lit(w2)) / cs) + 1))).head()
      System.err.println(s"[candidates] cellSize=$cs n=${dbg.getLong(0)} " +
        s"nBig=${dbg.getLong(1)} totalCells=${dbg.getLong(2)}")
    }

    val withCells = paddedP
      .withColumn("cx0", floor((col("minX") + lit(WORLD_W / 2)) / cs))
      .withColumn("cx1", floor((col("maxX") + lit(WORLD_W / 2)) / cs))
      .withColumn("cy0", floor((col("minY") + lit(WORLD_W / 2)) / cs))
      .withColumn("cy1", floor((col("maxY") + lit(WORLD_W / 2)) / cs))
      .withColumn("ncells",
        (col("cx1") - col("cx0") + 1) * (col("cy1") - col("cy0") + 1))

    // The shuffled/sorted rows are SKINNY (cell, ids, bbox) — geometry
    // payloads never enter the cell shuffle or the join sort. They are
    // attached afterwards by two id-joins whose wide outputs stream
    // directly into refinement without another shuffle.
    val skinny = withCells.select(col("gid"), col("side"), col("subId"),
      col("minX"), col("minY"), col("maxX"), col("maxY"),
      col("cx0"), col("cx1"), col("cy0"), col("cy1"), col("ncells"))

    val small = skinny.filter(col("ncells") <= cfg.bigCellThreshold)
    val big = skinny.filter(col("ncells") > cfg.bigCellThreshold)

    val bboxOverlap =
      col("a.minX") <= col("b.maxX") && col("b.minX") <= col("a.maxX") &&
        col("a.minY") <= col("b.maxY") && col("b.minY") <= col("a.maxY")
    val gidOrder =
      (col("a.gid") < col("b.gid")) ||
        (col("a.gid") === col("b.gid") && col("a.subId") < col("b.subId"))
    val sides = col("a.side") === 0 && col("b.side") === 1

    // explode cells for the small side
    val exploded = small
      .withColumn("cx", explode(sequence(col("cx0"), col("cx1"))))
      .withColumn("cy", explode(sequence(col("cy0"), col("cy1"))))
      .withColumn("cell", col("cx") * 4294967296L + col("cy"))
      .drop("cx0", "cx1", "cy0", "cy1", "ncells", "cx", "cy")

    val a = exploded.alias("a")
    val b = exploded.alias("b")
    // report each pair only in the first common cell (min corner of the
    // bbox intersection) -> no dropDuplicates shuffle needed
    val refCell =
      floor((greatest(col("a.minX"), col("b.minX")) + lit(WORLD_W / 2)) / cs) *
        4294967296L +
        floor((greatest(col("a.minY"), col("b.minY")) + lit(WORLD_W / 2)) / cs)
    val ssDisc = if (cfg.selfJoin) gidOrder else sides
    val smallPairs = a.join(b, col("a.cell") === col("b.cell") &&
      bboxOverlap && ssDisc && col("a.cell") === refCell)

    // big geometries join by bbox from the broadcast side; each unordered
    // pair appears exactly once: small-big pairs always land (small=a), and
    // big-big pairs are gid-ordered. Non-self joins keep side0 on a.
    val smallBig =
      if (cfg.selfJoin)
        small.alias("a").join(broadcast(big.alias("b")),
          bboxOverlap && !(col("a.gid") === col("b.gid")))
      else
        small.alias("a").join(broadcast(big.alias("b")),
          bboxOverlap && sides)
          .union(big.alias("a").join(broadcast(small.alias("b")),
            bboxOverlap && sides))
    val bigBig =
      big.alias("a").join(broadcast(big.alias("b")),
        bboxOverlap && (if (cfg.selfJoin) gidOrder else sides))

    def pick(df: DataFrame): DataFrame = df.select(
      col("a.gid").as("gidA"), col("a.side").as("sideA"),
      col("a.subId").as("subA"),
      col("b.gid").as("gidB"), col("b.side").as("sideB"),
      col("b.subId").as("subB"))

    val pairs =
      pick(smallPairs).union(pick(smallBig)).union(pick(bigBig))

    // attach geometry payloads (wide) by (gid, side, subId); side matters in
    // non-self joins where the same id can appear on both sides with
    // different geometries
    val gA = geoms.toDF().alias("ga")
    val gB = geoms.toDF().alias("gb")
    def side(alias: String) = struct(
      col(s"$alias.gid").as("gid"), col(s"$alias.side").as("side"),
      col(s"$alias.subId").as("subId"), col(s"$alias.nSubs").as("nSubs"),
      col(s"$alias.kind").as("kind"), col(s"$alias.coords").as("coords"),
      col(s"$alias.ringEnds").as("ringEnds"), col(s"$alias.minX").as("minX"),
      col(s"$alias.minY").as("minY"), col(s"$alias.maxX").as("maxX"),
      col(s"$alias.maxY").as("maxY"))
    pairs
      .join(gA, col("gidA") === col("ga.gid") && col("subA") === col("ga.subId")
        && col("sideA") === col("ga.side"))
      .join(gB, col("gidB") === col("gb.gid") && col("subB") === col("gb.subId")
        && col("sideB") === col("gb.side"))
      .select(side("ga").as("_1"), side("gb").as("_2"))
  }

  /** Exact refinement: candidate pairs -> per-sub-pair flag rows.
    * Geometry objects are cached per partition keyed by (gid, subId) so an
    * expensive polygon's edge index is built once per partition (role of
    * the reference's per-thread geometry caches, GeometryCache.cpp). */
  def refine(spark: SparkSession, cands: DataFrame,
      cfg: SpatialConfig): Dataset[FlagRow] = {
    import spark.implicits._
    val mode = cfg.mode
    val wd = cfg.withinDist
    // InternalRow access: ids are read by ordinal and the geometry payload
    // arrays are copied out of the unsafe row ONLY on a cache miss — the
    // per-row double-SubGeom decode was the dominant allocation source
    // (GC-bound at high mutator thread counts).
    val rdd = cands.queryExecution.toRdd.mapPartitions { rows =>
      // Bounded LRU: reuse edge indexes of hot geometries without keeping
      // an unbounded live set every GC must trace (role of the reference's
      // byte-capped per-thread caches, GeometryCache.cpp:16-78).
      val cache =
        new java.util.LinkedHashMap[(String, Int, Int), Geo.G](512, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[(String, Int, Int), Geo.G]): Boolean =
            size() > 256
        }
      def gOf(gid: String, side: Int, subId: Int,
          r: org.apache.spark.sql.catalyst.InternalRow): Geo.G = {
        // side is part of the key: a non-self join can carry the same id on
        // both sides with different geometries
        val k = (gid, side, subId)
        var g = cache.get(k)
        if (g == null) {
          g = new Geo.G(r.getInt(4), r.getArray(5).toIntArray(),
            r.getArray(6).toIntArray())
          cache.put(k, g)
        }
        g
      }
      rows.flatMap { row =>
        val a = row.getStruct(0, 11)
        val b = row.getStruct(1, 11)
        val gidA = a.getUTF8String(0).toString
        val subA = a.getInt(2); val nA = a.getInt(3); val kindA = a.getInt(4)
        val gidB = b.getUTF8String(0).toString
        val subB = b.getInt(2); val nB = b.getInt(3); val kindB = b.getInt(4)
        val ga = gOf(gidA, a.getInt(1), subA, a)
        val gb = gOf(gidB, b.getInt(1), subB, b)
        if (mode == "distance") {
          val d = Dist.geomDist(ga, gb)
          if (d <= wd)
            Some(FlagRow(gidA, subA, nA, kindA, gidB, subB, nB, kindB,
              isect = true, covAbyB = false, covBbyA = false,
              contAinB = false, contBinA = false, subEq = false,
              touch = false, notTouch = false, llCross = false,
              laCrossAB = false, laCrossBA = false, overlap = false,
              de9im = "", dist = d))
          else None
        } else {
          val r = Relate.relate(ga, gb)
          if (!r.isect) None
          else {
            val m =
              if (mode == "de9im") Relate.matToString(Relate.de9im(ga, gb))
              else ""
            Some(FlagRow(
              gidA, subA, nA, kindA, gidB, subB, nB, kindB,
              isect = r.isect,
              covAbyB = r.aCovByB, covBbyA = r.bCovByA,
              contAinB = r.aContInB, contBinA = r.bContInA,
              subEq = r.aCovByB && r.bCovByA,
              touch = r.touches,
              notTouch = r.interiorIsect,
              llCross = (kindA == 1 && kindB == 1) && r.crosses,
              laCrossAB = kindA == 1 && kindB == 2 && r.crosses,
              laCrossBA = kindA == 2 && kindB == 1 && r.crosses,
              overlap = r.overlaps,
              de9im = m,
              dist = -1.0))
          }
        }
      }
    }
    spark.createDataset(rdd)
  }

  /** Fan staged rows out through <ref> aliases, both sides, transitively
    * (reference: recursion inside every write*, e.g. Sweeper.cpp:2423-2450).
    * Also seeds self-relation rows for referenced geometries (selfCheck,
    * Sweeper.cpp:2453-2475). */
  def fanout(spark: SparkSession, flags: Dataset[FlagRow],
      edges: Array[RefEdge], geoms: Dataset[SubGeom],
      cfg: SpatialConfig): Dataset[FlagRow] = {
    import spark.implicits._
    // The alias table is tiny relative to the data (it is authored id
    // lists, collected ONCE by run); its transitive closure is computed on
    // the driver and fanned out with two broadcast joins instead of an
    // iterative distributed loop. P9's duplicate rewrite keeps its edges
    // distributed and bounded separately (see dedup below).
    if (edges.isEmpty) return flags

    // closure(target) = all direct and transitive referers with the
    // (subId, nSubs) slot discipline of the top referer
    val direct = edges.groupBy(_.target)
    val closure = scala.collection.mutable.Map.empty[String, List[RefEdge]]
    def referersOf(t: String, seen: Set[String]): List[RefEdge] =
      closure.getOrElse(t, {
        val ds = direct.getOrElse(t, Array.empty[RefEdge]).toList
        val all = ds ++ ds.flatMap { e =>
          // the reference's recursion looks referers up by the written
          // subId (_refs[gid][sub], Sweeper.cpp:2423-2450): a chain
          // continues only when the intermediate slot is 0 (single-target
          // ref); multi-slot refs break the chain.
          if (seen(e.referer) || e.subId != 0) Nil
          else referersOf(e.referer, seen + e.referer)
            .map(up => RefEdge(up.referer, up.side, t, up.subId, up.nSubs))
        }
        val dist = all.distinct
        closure(t) = dist
        dist
      })
    edges.map(_.target).distinct.foreach(t => referersOf(t, Set(t)))

    // self rows: (target, target) intersect/equal/cover/contain per
    // referenced geometry; only meaningful once fanned to a referer
    // (reference selfCheck, Sweeper.cpp:2453-2475).
    val kinds = geoms.groupBy(col("gid")).agg(max(col("kind")).as("k"))
    val selfRows = spark
      .createDataset(edges.map(_.target).distinct.toSeq).toDF("target")
      .join(kinds, col("target") === col("gid"), "left")
      .select(col("target"), coalesce(col("k"), lit(-1)).as("k"))
      .as[(String, Int)]
      .map { case (t, k) =>
        FlagRow(t, 0, 1, k, t, 0, 1, k,
          isect = true, covAbyB = true, covBbyA = true,
          contAinB = true, contBinA = true, subEq = true,
          touch = false, notTouch = false, llCross = false,
          laCrossAB = false, laCrossBA = false,
          overlap = false, de9im = "", dist = 0.0)
      }

    val closDf = broadcast(spark.createDataset(
      closure.toSeq.flatMap { case (t, rs) =>
        rs.map(r => (t, r.referer, r.subId, r.nSubs))
      }).toDF("c_target", "c_referer", "c_sub", "c_n"))

    def fan(df: DataFrame, onA: Boolean): DataFrame = {
      val key = if (onA) "gidA" else "gidB"
      val subKey = if (onA) "subA" else "subB"
      // the reference registers referers only under target subId 0
      // (_refs[raw][0], Sweeper.cpp:740): multi parts never fan.
      df.join(closDf,
          df(key) === closDf("c_target") && df(subKey) === 0)
        .withColumn(key, col("c_referer"))
        .withColumn(subKey, col("c_sub"))
        .withColumn(if (onA) "nA" else "nB", col("c_n"))
        .drop("c_target", "c_referer", "c_sub", "c_n")
    }

    // expand side A (keeping originals), then side B of that result:
    // yields the full product closure(a) x closure(b), matching the
    // reference's recursive fanout in every write* call.
    val base = flags.union(selfRows).toDF()
    val withA = base.union(fan(base, onA = true))
    val withAB = withA.union(fan(withA, onA = false))
    withAB.as[FlagRow]
  }

  /** Aggregate sub-pair flags into relations per (gidA, gidB), reproducing
    * the reference's multiOut semantics (Sweeper.cpp:788-1059). Output:
    * (a_id, predicate, b_id) in predicates mode; (a_id, matrix, b_id) in
    * de9im mode; (a_id, dist, b_id) in distance mode. */
  def aggregate(spark: SparkSession, flags: Dataset[FlagRow],
      cfg: SpatialConfig, hadRefs: Boolean = true): DataFrame = {
    import spark.implicits._
    val pairFlags = flags.filter(col("gidA") =!= col("gidB"))

    if (cfg.mode == "distance") {
      val agg = pairFlags.groupBy(col("gidA"), col("gidB"))
        .agg(min(col("dist")).as("dist"))
      val fwd = agg.select(col("gidA").as("a_id"), col("dist"),
        col("gidB").as("b_id"))
      val rels =
        if (cfg.selfJoin)
          fwd.union(agg.select(col("gidB").as("a_id"), col("dist"),
            col("gidA").as("b_id")))
        else fwd
      return rels.distinct()
    }

    if (cfg.mode == "de9im") {
      val merged = pairFlags
        .filter(length(col("de9im")) === 9 || col("dist") === 0.0)
        .as[FlagRow]
        .groupByKey(f => (f.gidA, f.gidB))
        .mapGroups { (key: (String, String), it: Iterator[FlagRow]) =>
          val (ga, gb) = key
          var m: Relate.Mat = null
          var kindB = -2
          it.foreach { f =>
            val mat =
              if (f.de9im.length == 9)
                f.de9im.map { case 'F' => -1; case c => c - '0' }.toArray
              else selfMat(f.kindB)
            m = if (m == null) mat else Relate.merge(m, mat)
            kindB = f.kindB
          }
          (ga, Relate.matToString(m), gb, Relate.matToString(Relate.transpose(m)))
        }
        .toDF("gidA", "mat", "gidB", "matT")
      val fwd = merged.select(col("gidA").as("a_id"), col("mat").as("de9im"),
        col("gidB").as("b_id"))
      val rels =
        if (cfg.selfJoin)
          fwd.union(merged.select(col("gidB").as("a_id"),
            col("matT").as("de9im"), col("gidA").as("b_id")))
        else fwd
      return rels.distinct()
    }

    // ---------------------------------------------------------- predicates
    // both aggregation branches (codegen fast path + typed fallback) read
    // the refined flags: materialize them once instead of re-running the
    // whole join+refine per branch
    val flagsP = pairFlags
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // One-pass codegen aggregation: distinct-sub counting via 64-bit
    // bit_or masks (sub ids < 64 cover all but pathological multis; those
    // few pairs take a typed-Aggregator fallback). This stays inside
    // whole-stage codegen — multi-countDistinct would EXPAND every row 7x,
    // and a typed Aggregator drops the stage out of codegen entirely.
    def any(c: Column): Column = max(c.cast("int")) === 1

    val agg1 = flagsP.groupBy(col("gidA"), col("gidB")).agg(
      max(col("nA")).as("nA"), max(col("nB")).as("nB"),
      max(col("subA")).as("maxSubA"), max(col("subB")).as("maxSubB"),
      any(col("isect")).as("isect"),
      any(col("touch")).as("anyTouch"),
      any(col("notTouch")).as("anyNotTouch"),
      any(col("llCross")).as("anyLLCross"),
      any(col("laCrossAB")).as("anyLAab"),
      any(col("laCrossBA")).as("anyLAba"),
      any(col("overlap")).as("anyOverlap"),
      any(col("covAbyB") || col("covBbyA") || col("overlap"))
        .as("anyNotCross"),
      expr("bit_or(IF(covAbyB, shiftleft(1L, subA), 0L))").as("covAM"),
      expr("bit_or(IF(covBbyA, shiftleft(1L, subB), 0L))").as("covBM"),
      expr("bit_or(IF(contAinB, shiftleft(1L, subA), 0L))").as("contAM"),
      expr("bit_or(IF(contBinA, shiftleft(1L, subB), 0L))").as("contBM"),
      expr("bit_or(IF(subEq, shiftleft(1L, subA), 0L))").as("eqAM"),
      expr("bit_or(IF(subEq, shiftleft(1L, subB), 0L))").as("eqBM"))

    val fastOk = col("maxSubA") < 64 && col("maxSubB") < 64

    def verdictCols(covCntA: Column, covCntB: Column, contCntA: Column,
        contCntB: Column, eqCntA: Column, eqCntB: Column): Seq[Column] = {
      val coversAB = covCntB === col("nB")
      val coversBA = covCntA === col("nA")
      val partial = (covCntA > 0 && covCntA < col("nA")) ||
        (covCntB > 0 && covCntB < col("nB"))
      Seq(
        col("isect").as("r_isect"),
        coversAB.as("r_coversAB"), coversBA.as("r_coversBA"),
        (contCntB === col("nB")).as("r_containsAB"),
        (contCntA === col("nA")).as("r_containsBA"),
        (col("nA") === col("nB") && eqCntA === col("nA") &&
          eqCntB === col("nB")).as("r_equals"),
        (col("anyTouch") && !col("anyNotTouch")).as("r_touches"),
        ((col("anyLLCross") && !col("anyNotCross")) || col("anyLAab"))
          .as("r_crossesAB"),
        ((col("anyLLCross") && !col("anyNotCross")) || col("anyLAba"))
          .as("r_crossesBA"),
        ((col("anyOverlap") || partial) && !coversAB && !coversBA &&
          !col("anyLLCross")).as("r_overlaps"))
    }

    val fast = agg1.filter(fastOk).select(
      Seq(col("gidA"), col("gidB")) ++ verdictCols(
        bit_count(col("covAM")).cast("long"),
        bit_count(col("covBM")).cast("long"),
        bit_count(col("contAM")).cast("long"),
        bit_count(col("contBM")).cast("long"),
        bit_count(col("eqAM")).cast("long"),
        bit_count(col("eqBM")).cast("long")): _*)

    // pathological multis (sub ids >= 64): exact typed aggregation
    val badKeys = agg1.filter(!fastOk).select(col("gidA").as("bk_a"),
      col("gidB").as("bk_b"))
    val slow = flagsP
      .join(broadcast(badKeys), col("gidA") === col("bk_a") &&
        col("gidB") === col("bk_b"), "left_semi")
      .as[FlagRow]
      .groupByKey(f => (f.gidA, f.gidB))
      .agg(RelAgg.toColumn.name("r"))
      .toDF("key", "r")
      .select(
        col("key._1").as("gidA"), col("key._2").as("gidB"),
        col("r.isect").as("r_isect"),
        col("r.coversAB").as("r_coversAB"),
        col("r.coversBA").as("r_coversBA"),
        col("r.containsAB").as("r_containsAB"),
        col("r.containsBA").as("r_containsBA"),
        col("r.equalsAB").as("r_equals"),
        col("r.touchesAB").as("r_touches"),
        col("r.crossesAB").as("r_crossesAB"),
        col("r.crossesBA").as("r_crossesBA"),
        col("r.overlapsAB").as("r_overlaps"))

    val marked = fast.union(slow)

    // assemble (a_id, predicate, b_id); in non-self mode only side-A-first
    // pairs survive (writeRel discipline, Sweeper.cpp:2287-2288) — the join
    // already ordered A=side0, B=side1, so "reverse" rows are dropped.
    val bothDirs = cfg.selfJoin
    def rel(cond: Column, aId: Column, pred: String, bId: Column) =
      when(cond, struct(aId.as("a_id"), lit(pred).as("predicate"),
        bId.as("b_id")))

    val A = col("gidA"); val B = col("gidB")
    val relArray = array(
      rel(col("r_isect"), A, "intersects", B),
      rel(col("r_isect") && lit(bothDirs), B, "intersects", A),
      rel(col("r_equals"), A, "equals", B),
      rel(col("r_equals") && lit(bothDirs), B, "equals", A),
      rel(col("r_coversAB"), A, "covers", B),
      rel(col("r_coversBA") && lit(bothDirs), B, "covers", A),
      rel(col("r_containsAB"), A, "contains", B),
      rel(col("r_containsBA") && lit(bothDirs), B, "contains", A),
      rel(col("r_touches"), A, "touches", B),
      rel(col("r_touches") && lit(bothDirs), B, "touches", A),
      // crosses: line/line both directions (with retraction); line/area
      // crosses are folded in line-side-first with no retraction
      // (reference writes those immediately, Sweeper.cpp:3017-3020)
      rel(col("r_crossesAB"), A, "crosses", B),
      rel(col("r_crossesBA") && lit(bothDirs), B, "crosses", A),
      rel(col("r_overlaps"), A, "overlaps", B),
      rel(col("r_overlaps") && lit(bothDirs), B, "overlaps", A))

    // without refs each (a,pred,b) row originates from exactly one pair
    // group and one array slot — no final distinct shuffle needed; alias
    // fanout can mirror a pair into both orientations, so dedup then
    val rels = marked
      .select(explode(relArray).as("rel"))
      .filter(col("rel").isNotNull)
      .select(col("rel.a_id"), col("rel.predicate"), col("rel.b_id"))
    if (hadRefs) rels.distinct() else rels
  }

  private def selfMat(kind: Int): Relate.Mat = kind match {
    case 0 => Relate.SELF_POINT
    case 1 => Relate.SELF_LINE
    case _ => Relate.SELF_AREA
  }

  /** Full pipeline: sub-geometries (+ refs) -> relations DataFrame. */
  def run(spark: SparkSession, geoms: Dataset[SubGeom],
      refs: Dataset[RefEdge], cfg: SpatialConfig = SpatialConfig())
      : DataFrame = {
    // typed-Aggregator groups number in the millions: keep
    // ObjectHashAggregate in hash mode instead of its 128-key sort fallback
    val fbKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    if (spark.conf.getOption(fbKey).forall(_.toLong < (1 << 22)))
      spark.conf.set(fbKey, (1 << 22).toString)
    // the payload table is scanned by both attach joins (and by fanout for
    // ref target kinds); materialize it once
    val g = geoms.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = candidates(spark, g, cfg)
    val flags = refine(spark, cands, cfg)
    val edges = refs.collect()
    if (edges.isEmpty) aggregate(spark, flags, cfg, hadRefs = false)
    else {
      val fanned = fanout(spark, flags, edges, g, cfg)
      aggregate(spark, fanned, cfg, hadRefs = true)
    }
  }
}
