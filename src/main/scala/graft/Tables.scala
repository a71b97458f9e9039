package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-read helper shared by the query packs. */
object Tables {

  /** Read a parquet table, spreading an under-partitioned scan across the
    * available cores. The local fixture tables are single-row-group parquet
    * files — unsplittable, so the scan is ONE task regardless of
    * `spark.sql.files.maxPartitionBytes`, and any per-row work ahead of the
    * first shuffle (regex scoring, shingling, hash signatures, candidate
    * expansion of a broadcast join) would run on one core. At deployment
    * scale inputs have many splits, the branch never fires, and no shuffle
    * is added; predicates and column pruning push through the repartition
    * either way.
    */
  def parquet(s: SparkSession, path: String): DataFrame = {
    val df = s.read.parquet(path)
    val want = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < want) df.repartition(want) else df
  }
}
