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

/** kNN over point geometries: distance join + windowed top-k
  * (north-rule operator; closest reference machinery is the
  * within-distance mode, src/spatialjoin/Sweeper.cpp:4015-4277). */
object Knn {

  /** For each query point (a sample of the input), the k nearest other
    * points by squared euclidean int-space distance; deterministic
    * tie-break on gid. Queries are broadcast (small side). */
  def pointKnn(spark: SparkSession, pts0: DataFrame, queryFilter: org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    // a cross join inherits the probe scan's partitioning; spread it first
    val pts = pts0.repartition(spark.sparkContext.defaultParallelism * 2)
    val q = pts.filter(queryFilter)
      .select(col("gid").as("q_gid"), col("x").cast("long").as("qx"),
        col("y").cast("long").as("qy"))
    val w = Window.partitionBy(col("q_gid"))
      .orderBy(col("dist2").asc, col("gid").asc)
    val dx = col("x").cast("long") - col("qx")
    val dy = col("y").cast("long") - col("qy")
    pts.crossJoin(broadcast(q))
      .filter(col("gid") =!= col("q_gid"))
      .select(col("q_gid"), col("gid"), (dx * dx + dy * dy).as("dist2"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }
}
