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

  /** Per-user session counts via flatMapGroupsWithState-style semantics,
    * expressed with the simpler mapGroups on batch and usable with
    * GroupStateTimeout in streaming jobs. Sessions split on gaps > 30 min. */
  def sessionize(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("ts").cast("long").as("t"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (user: Long, it: Iterator[(Long, Long)]) =>
        val ts = it.map(_._2).toArray.sorted
        var sessions = 0L
        var last = Long.MinValue
        var events = 0L
        ts.foreach { t =>
          if (last == Long.MinValue || t - last > 1800) sessions += 1
          last = t
          events += 1
        }
        Iterator((user, sessions, events))
      }
      .toDF("user_id", "n_sessions", "n_events")
  }
}
