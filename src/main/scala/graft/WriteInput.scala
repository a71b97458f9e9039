package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: pre-write a [[graft.engine.SynthGeo]] bench input as
  * parquet at full parallelism, so standalone [[SpatialChild]] legs (A/B
  * experiments outside the Bench harness) can read it instead of
  * regenerating on their own cores.
  * Usage: WriteInput <nGeoms> <outPath> [skew] — `skew` writes the
  * continent-polygon-plus-point-cloud probe instead (submit skew leg).
  */
object WriteInput {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ds =
      if (args.length > 2 && args(2) == "skew")
        graft.engine.SynthGeo.skewDataset(spark, args(0).toLong)
      else graft.engine.SynthGeo.dataset(spark, args(0).toLong)
    ds.write.mode("overwrite").parquet(args(1))
    spark.stop()
  }
}
