package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the write-once PiP screen (round 5): measures what the
  * index buys a RESTARTING geo-enrichment stream — the inline face pays
  * the polygon corpus's stats pass + cover build on every start, the
  * indexed face pays a parquet read + decode projection — and asserts the
  * two faces produce identical (point, polygon) sets at scale. Run:
  *
  *   sbt "Test/runMain graft.engine.PipScreenProbe [<nGeoms>] [<nPts>]"
  *
  * The corpus is the SynthGeo mix's building polygons (~nGeoms/3 areas);
  * per-start cost is min-of-2 full tag jobs per face (the write itself is
  * timed separately — it is the once-ever cost).
  */
object PipScreenProbe {
  def main(args: Array[String]): Unit = {
    val nGeoms = if (args.nonEmpty) args(0).toLong else 1000000L
    val nPts = if (args.length > 1) args(1).toLong else 200000L
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val polys = SynthGeo.dataset(spark, nGeoms).filter(_.kind == 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPolys = polys.count()
    // probe points spread over the same country extent as the corpus
    // (SynthGeo's lon 5..15, lat 47..55 box)
    import graft.geom.Geo
    val xmin = Geo.projX(5.0).toLong
    val xspan = Geo.projX(15.0).toLong - xmin
    val ymin = Geo.projY(47.0).toLong
    val yspan = Geo.projY(55.0).toLong - ymin
    val pts = spark.range(nPts).select(col("id"),
        (lit(xmin) + (col("id") * 7919) % xspan).cast("int").as("x"),
        (lit(ymin) + (col("id") * 104729) % yspan).cast("int").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pts.count()

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // inline face: every "stream start" pays coverTable over the corpus
    def inlineStart(): Long =
      graft.streaming.StreamOps.pointInPolygon(pts.toDF(), polys).count()
    val inline = (1 to 2).map(_ => time(inlineStart())).minBy(_._1)

    // indexed face: write once, then each start reads the screen
    val dir = java.nio.file.Files.createTempDirectory("graft-pip-probe")
      .toString
    val (tWrite, _) = time {
      SpatialIndex.write(spark, polys, spark.emptyDataset[RefEdge],
        SpatialConfig(), dir)
    }
    def indexedStart(): Long = {
      val screen = SpatialIndex.pipScreen(spark, dir)
      graft.streaming.StreamOps.pointInPolygonIndexed(pts.toDF(), screen)
        .count()
    }
    val indexed = (1 to 2).map(_ => time(indexedStart())).minBy(_._1)

    // materialized screen: pre-exploded native cells, clustered by cell —
    // a batch pays only the pruned parquet scan + equi-join
    val matDir = java.nio.file.Files.createTempDirectory("graft-pip-mat")
      .toString
    val (tMat, _) = time(SpatialIndex.writePipScreen(spark, dir, matDir))
    def matStart(): Long = {
      val screen = SpatialIndex.readPipScreen(spark, matDir)
      graft.streaming.StreamOps.pointInPolygonIndexed(pts.toDF(), screen)
        .count()
    }
    val mat = (1 to 2).map(_ => time(matStart())).minBy(_._1)

    require(inline._2 == indexed._2 && inline._2 == mat._2,
      s"faces disagree: inline=${inline._2} indexed=${indexed._2} " +
        s"mat=${mat._2}")
    // exact set parity at scale (distributed except, nothing collected)
    val a = graft.streaming.StreamOps.pointInPolygon(pts.toDF(), polys)
      .select(col("id"), col("gid"), col("subId"))
    val screen = SpatialIndex.pipScreen(spark, dir)
    val b = graft.streaming.StreamOps.pointInPolygonIndexed(pts.toDF(), screen)
      .select(col("id"), col("gid"), col("subId"))
    require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "face row sets diverge")

    println(f"[probe] nPolys=$nPolys nPts=$nPts tags=${inline._2} " +
      f"inline_batch=${inline._1}%.3f s packed_batch=${indexed._1}%.3f s " +
      f"mat_batch=${mat._1}%.3f s write_once=$tWrite%.3f s " +
      f"mat_once=$tMat%.3f s speedup_mat=${inline._1 / mat._1}%.2f")
    spark.stop()
  }
}
