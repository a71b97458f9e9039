package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.geom.Geo

/** Raster<->vector tile assignment: expose the engine's grid-cell cover as
  * an output (north-rule operator; the reference's boxIds cover plays this
  * role internally, reference: src/spatialjoin/BoxIds.h:99-162). */
object Tiles {

  /** (gid, subId, tx, ty) for every grid tile whose cell the sub-geometry's
    * bbox overlaps, at tile size `cellSize` (int web-mercator units). */
  def assign(geoms: Dataset[SubGeom], cellSize: Long): DataFrame = {
    val w2 = lit(Geo.WORLD_W / 2)
    geoms.toDF()
      .withColumn("tx0", floor((col("minX") + w2) / cellSize))
      .withColumn("tx1", floor((col("maxX") + w2) / cellSize))
      .withColumn("ty0", floor((col("minY") + w2) / cellSize))
      .withColumn("ty1", floor((col("maxY") + w2) / cellSize))
      .select(col("gid"), col("subId"),
        explode(sequence(col("tx0"), col("tx1"))).as("tx"),
        col("ty0"), col("ty1"))
      .select(col("gid"), col("subId"), col("tx"),
        explode(sequence(col("ty0"), col("ty1"))).as("ty"))
  }
}

/** kNN over point geometries: exact expanding cell-ring search
  * (north-rule operator; closest reference machinery is the
  * within-distance mode, src/spatialjoin/Sweeper.cpp:4015-4277). */
object Knn {

  /** For each query point (a filter over the input), the k nearest other
    * points by squared euclidean int-space distance; deterministic
    * tie-break on gid.
    *
    * Scale-safe exact algorithm (replaces the round-1 crossJoin x
    * broadcast-sample, whose work grew O(n * q)): points land once in a
    * grid sized so a 3x3 neighborhood holds ~4k points; each round joins
    * the unresolved queries' cell disk of radius r against the grid and
    * resolves every query whose kth candidate lies within the guaranteed
    * radius r*s (any unscanned point is strictly farther). r doubles per
    * round, so isolated queries cost a handful of extra rounds instead of
    * dragging a full scan for everyone.
    */
  def pointKnn(spark: SparkSession, pts0: DataFrame,
      queryFilter: org.apache.spark.sql.Column, k: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    // carried-state checkpointing: localCheckpoint by default (fastest;
    // blocks in executor storage), or a RELIABLE Dataset.checkpoint when
    // a fault-tolerant dir is supplied — executor loss then recomputes
    // from files instead of failing the job (same contract as
    // ConnectedComponents.run; parity in EngineOpsSpec).
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    def cp(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true)
      else df.localCheckpoint()
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val pts = pts0.select(col("gid"), col("x").cast("long").as("x"),
      col("y").cast("long").as("y"))
    val st = pts.agg(count(lit(1)), min(col("x")), max(col("x")),
      min(col("y")), max(col("y"))).head()
    val n = math.max(st.getLong(0), 1L)
    val w = math.max(st.getLong(2) - st.getLong(1) + 1, 1L)
    val h = math.max(st.getLong(4) - st.getLong(3) + 1, 1L)
    val s = math.max(1L,
      math.sqrt(w.toDouble * h.toDouble * 4.0 * k / n.toDouble).toLong)
    val cells = pts
      .withColumn("cx", floor(col("x") / s))
      .withColumn("cy", floor(col("y") / s))
      .persist(lvl)
    val queries0 = cells.filter(queryFilter)
      .select(col("gid").as("q_gid"), col("x").as("qx"), col("y").as("qy"),
        col("cx").as("qcx"), col("cy").as("qcy"))

    val byQ = Window.partitionBy(col("q_gid"))
      .orderBy(col("dist2").asc, col("gid").asc)
    // Iteration hygiene: per-round intermediates are persisted only for the
    // round and unpersisted once their dependents are materialized; the
    // carried state (unresolved set, resolved rows) is localCheckpoint'ed —
    // eager, truncates the per-round lineage so planning cost stays flat
    // and the returned DataFrame never recomputes the ring search. The
    // checkpoint blocks are released by the ContextCleaner when the caller
    // drops the result (standard iterative-algorithm pattern; on a real
    // cluster with executor churn, set a checkpoint dir and swap in
    // Dataset.checkpoint).
    var unresolved = cp(queries0)
    // |unresolved| per round: cheap (the carried state is checkpointed) and
    // it sizes the ring-disk broadcast decision below
    var uCount = unresolved.count()
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // start at r=2: the guarantee radius r*s must exceed the k-th-NN
    // distance for a query to resolve, and at the cell sizing above the
    // typical k-th neighbor sits well inside ONE cell — but boundary /
    // sparse-pocket queries routinely missed the r=1 guarantee, and each
    // straggler round costs ~4 driver-serial jobs. A 5x5 disk multiplies
    // round-1 candidates ~2.8x (still tiny next to the full table) and
    // resolves near-everything in one round.
    var r = 2L
    var done = false
    while (!done) {
      // disk of (2r+1)^2 cells covers everything once (2r+1)*s spans the
      // data extent -> final round resolves unconditionally
      val wholeWorld = (2 * r + 1) * s >= math.max(w, h)
      val disk = unresolved
        .withColumn("ox", explode(sequence(lit(-r), lit(r))))
        .withColumn("oy", explode(sequence(lit(-r), lit(r))))
        .withColumn("cx", col("qcx") + col("ox"))
        .withColumn("cy", col("qcy") + col("oy"))
      // guide §3.1/§2.4: the query-cell disk is tiny (queries x (2r+1)^2
      // rows) while `cells` is the full point table — a sort-merge join
      // here shuffles EVERY point EVERY round. Broadcasting the disk makes
      // the big side flow with no Exchange at all (the only remaining
      // shuffle is the q_gid window over the candidates). The explicit
      // row-count guard (not a byte estimate) falls back to the shuffle
      // join if a straggler query ever inflates the disk past ~2M rows.
      val diskRows = uCount * (2 * r + 1) * (2 * r + 1)
      val cand = (if (diskRows <= 2000000L) cells.join(broadcast(disk),
          Seq("cx", "cy"))
        else disk.join(cells, Seq("cx", "cy")))
        .filter(col("gid") =!= col("q_gid"))
        .select(col("q_gid"), col("gid"),
          ((col("x") - col("qx")) * (col("x") - col("qx")) +
            (col("y") - col("qy")) * (col("y") - col("qy"))).as("dist2"))
      val ranked = cand.withColumn("rk", row_number().over(byQ))
        .filter(col("rk") <= k)
        .persist(lvl)
      val guarantee = (r * s) * (r * s)
      val resolvedKeys = ranked.groupBy(col("q_gid").as("kq"))
        .agg(count(lit(1)).as("nc"), max(col("dist2")).as("kd"))
        .filter(lit(wholeWorld) ||
          (col("nc") === k && col("kd") <= guarantee))
        .select(col("kq"))
        .persist(lvl)
      parts += cp(ranked
        .join(resolvedKeys, col("q_gid") === col("kq"), "left_semi")
        .select(col("q_gid"), col("gid"), col("dist2"), col("rk")))
      if (wholeWorld) done = true
      else {
        val next = cp(unresolved
          .join(resolvedKeys, col("q_gid") === col("kq"), "left_anti"))
        uCount = next.count()
        done = uCount == 0L
        unresolved = next
      }
      ranked.unpersist(false)
      resolvedKeys.unpersist(false)
      // Straggler schedule: each extra round costs ~4 driver-serial jobs,
      // so geometric growth only pays while the candidate volume it
      // avoids is large. Once the remaining queries are few enough that
      // even a full scan on their behalf is small (uCount * n rows
      // through the rank window), jump straight to the whole-world
      // radius and finish in ONE unconditional round; otherwise grow 4x.
      r = if (uCount * n <= 50000000L)
        math.max(r, math.max(w, h) / (2 * s) + 1)
      else r * 4
    }
    cells.unpersist(false)
    parts.reduce(_.union(_))
  }
}
