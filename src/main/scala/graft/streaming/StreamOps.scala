package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming operators over the events stream shape
  * (event_id, ts, user_id, event_type, value). The same plan serves batch
  * DataFrames (Verify/Bench) and streaming Datasets (readStream) — this is
  * the declare-once benefit of building on Dataset transformations.
  */
object StreamOps {

  /** Tumbling 1-hour windowed aggregation with a 30-minute watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming spatial ingest: geo-tagged events (ts, x, y int
    * web-mercator) -> watermarked per-tile counts per tumbling window.
    * This is the streaming face of the engine's raster<->vector tile
    * assignment (graft.engine.Tiles): the tile key is the same grid-cell
    * arithmetic, so a streaming pipeline can land windowed tile
    * aggregates that line up exactly with batch tile joins. Works
    * identically on a batch DataFrame (tested for parity in
    * StreamingSpec). */
  def tileCounts(events: DataFrame, tileSize: Long,
      window_ : String = "1 hour", watermark: String = "30 minutes")
      : DataFrame = {
    val w2 = lit(graft.geom.Geo.WORLD_W / 2)
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"),
        floor((col("x") + w2) / tileSize).as("tx"),
        floor((col("y") + w2) / tileSize).as("ty"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("tx"), col("ty"),
        col("n_events"))
  }

  /** Streaming point-in-polygon enrichment: a stream of geo-tagged events
    * (any columns + x, y int web-mercator) joined against a STATIC polygon
    * set, emitting one row per (event, containing polygon).
    *
    * Shape: the polygons' multi-level cell cover (the same cover the batch
    * join shuffles on) is filtered to each polygon's NATIVE level, the
    * stream side computes its single containing cell per active level, and
    * a stream-static equi-join on the cell key + bbox prefilter + exact
    * ray-cast refine completes the predicate. Each (event, polygon) pair
    * meets exactly once — in the polygon's native-level cell holding the
    * point. Stream-static inner joins need no watermark; the static side
    * is bounded by the polygon set, and at cluster scale Spark broadcasts
    * it per-microbatch or hash-joins it, both stateless. Works identically
    * on a batch DataFrame (parity-tested in EngineOpsSpec). */
  def pointInPolygon(points: DataFrame,
      polys: org.apache.spark.sql.Dataset[graft.engine.SubGeom]): DataFrame = {
    import graft.engine.{SpatialConfig, SpatialJoin}
    val areas = polys.filter(_.kind == 2)
    val (cover, cs, lvls) = SpatialJoin.coverTable(areas, SpatialConfig())
    val native = cover.filter(col("lvl") === col("nlvl"))
      .select(col("cell"), col("gid"), col("subId"), col("coords"),
        col("ringEnds"), col("minX"), col("minY"), col("maxX"),
        col("maxY"))
    pipJoin(points, native, cs, lvls)
  }

  /** [[pointInPolygon]] against a WRITE-ONCE [[graft.engine.SpatialIndex]]
    * via its [[graft.engine.SpatialIndex.PipScreen]]: identical join and
    * output, but the polygon side's preparation (parse, stats pass, cover
    * derivation) was paid ONCE at index-write time — a stream (re)start
    * pays a parquet read + one decode projection. The deployment shape for
    * continuous geo-enrichment of a crawl against a planetary polygon
    * corpus; same contract as the text corpus screen
    * ([[graft.ops.TextSim.nearDupScreen]] vs its write-once index). */
  def pointInPolygonIndexed(points: DataFrame,
      screen: graft.engine.SpatialIndex.PipScreen): DataFrame =
    pipJoin(points, screen.native, screen.cellSize, screen.levels)

  private def pipJoin(points: DataFrame, native: DataFrame, cs: Long,
      lvls: Seq[Int]): DataFrame = {
    import graft.engine.SpatialJoin
    import graft.geom.Geo
    val w2 = Geo.WORLD_W / 2
    val cellAt = lvls.map { l =>
      val csL = (cs << (SpatialJoin.LEVEL_FACTOR_BITS * l)).toDouble
      shiftleft(lit(l.toLong), SpatialJoin.CELL_LVL_SHIFT) +
        (floor((col("x") + w2) / csL) + SpatialJoin.CELL_BIAS) *
        (1L << SpatialJoin.CELL_XY_BITS) +
        (floor((col("y") + w2) / csL) + SpatialJoin.CELL_BIAS)
    }
    val probed = points.withColumn("cell", explode(array(cellAt: _*)))
    // exact refinement as a codegen'd expression over the flat int arrays
    // (zero boxing, zero copies — the r3 Seq[Int] UDF rebuilt a Geo.G per
    // candidate row); bbox filter first so the ray cast sees survivors only
    import org.apache.spark.sql.GraftInternal.{colOf, exprOf}
    val inPoly = colOf(graft.engine.PipExpr(exprOf(col("x")),
      exprOf(col("y")), exprOf(col("coords")), exprOf(col("ringEnds"))))
    probed.join(native, "cell")
      .filter(col("x") >= col("minX") && col("x") <= col("maxX") &&
        col("y") >= col("minY") && col("y") <= col("maxY"))
      .filter(inPoly)
      .drop("cell", "coords", "ringEnds", "minX", "minY", "maxX", "maxY")
  }

  /** Streaming exact deduplication over a document stream
    * (url, ts, text): emits the FIRST document per content fingerprint
    * (xxhash64 of the text, the same key as the batch q9 dedup),
    * suppresses later duplicates while the key's state lives, and expires
    * state via EVENT-TIME timeout `ttlMs` past the watermark.
    *
    * Scale shape: per-key state is one long (the key's latest
    * sighting, keeping the TTL anchor monotone under out-of-order
    * duplicates) and lives O(ttl), not
    * O(stream length) — the bounded-state contract a continuous crawl
    * ingest needs. The tradeoff every TTL'd streaming dedup makes: a
    * duplicate arriving after its key expired re-emits (downstream batch
    * dedup catches it). Within a micro-batch ties break deterministically
    * to the smallest (ts, url). The same function runs on a batch
    * DataFrame (flatMapGroupsWithState degenerates to one stateless group
    * pass) where it equals "first row per fingerprint" — parity-tested in
    * EngineOpsSpec. */
  def dedupStream(spark: SparkSession, docs: DataFrame,
      watermark: String = "30 minutes",
      ttlMs: Long = 3600L * 1000): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val isStreaming = docs.isStreaming
    val projected = docs
      .select(col("url").cast("string"), col("ts").cast("timestamp"),
        xxhash64(col("text")).as("fp"))
    // watermark AFTER the projection: a cast on a watermarked column mints
    // a fresh attribute without the event-time tag, and the stateful op
    // then fails the streaming checker
    val keyed = (if (isStreaming) projected.withWatermark("ts", watermark)
      else projected)
      .as[(String, java.sql.Timestamp, Long)]
      .groupByKey(_._3)
    val timeoutConf =
      if (isStreaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout // batch: timeouts never fire
    keyed.flatMapGroupsWithState(
        OutputMode.Append, timeoutConf)(
      (fp: Long, rows: Iterator[(String, java.sql.Timestamp, Long)],
       state: GroupState[Long]) => {
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          // one pass: the (ts, url)-min row (the emit candidate) and the
          // max event time (the TTL anchor — NOT the current watermark,
          // which is still 0 during the first batch and would expire
          // every key immediately)
          var maxTs = Long.MinValue
          var best: (String, java.sql.Timestamp, Long) = null
          rows.foreach { r =>
            val t = r._2.getTime
            if (t > maxTs) maxTs = t
            if (best == null || t < best._2.getTime ||
              (t == best._2.getTime && r._1 < best._1)) best = r
          }
          val first =
            if (state.exists || best == null) Iterator.empty
            else Iterator(best)
          // state = max event time seen across ALL batches, so the TTL
          // anchor is MONOTONE: an out-of-order duplicate (batch maxTs
          // below a prior sighting) must not move the timeout EARLIER
          val maxSeen =
            math.max(if (state.exists) state.get else Long.MinValue, maxTs)
          state.update(maxSeen)
          // sliding TTL past the key's latest sighting; event-time
          // timeouts require a timestamp above the watermark, which
          // maxSeen + ttl always is (late rows never reach the function)
          if (isStreaming && maxSeen != Long.MinValue)
            state.setTimeoutTimestamp(maxSeen + ttlMs)
          first.map(r => (r._1, r._2, r._3))
        }
      }).toDF("url", "ts", "fp")
  }

  /** Per-user session counts; sessions split on gaps > 30 min.
    *
    * Scale shape: the events are hash-partitioned by user and sorted
    * WITHIN partitions by (user, ts) — Tungsten's spillable sort — then a
    * linear constant-memory scan emits one row per user at the key
    * boundary. The round-1 groupByKey version buffered each user's full
    * timestamp array on the heap, which a hot key (billions of events)
    * would OOM; this shape never materializes a per-key collection. */
  def sessionize(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("long").as("t"))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("t"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        new Iterator[(Long, Long, Long)] {
          private var curUser = Long.MinValue
          private var nSessions = 0L
          private var nEvents = 0L
          private var last = Long.MinValue
          private var pending: (Long, Long, Long) = _
          private var finished = false
          private def flush(): (Long, Long, Long) =
            (curUser, nSessions, nEvents)
          private def advance(): Unit = {
            while (pending == null && !finished) {
              if (!it.hasNext) {
                finished = true
                if (nEvents > 0) pending = flush()
              } else {
                val (u, t) = it.next()
                if (u != curUser) {
                  if (nEvents > 0) pending = flush()
                  curUser = u; nSessions = 0L; nEvents = 0L
                  last = Long.MinValue
                }
                if (last == Long.MinValue || t - last > 1800) nSessions += 1
                last = t
                nEvents += 1
              }
            }
          }
          override def hasNext: Boolean = { advance(); pending != null }
          override def next(): (Long, Long, Long) = {
            advance(); val r = pending; pending = null; r
          }
        }
      }
      .toDF("user_id", "n_sessions", "n_events")
  }
}
