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
  /** Memoized spread decision per (path, parallelism): resolving the scan
    * partition count costs a full physical-planning pass (`df.rdd`), and
    * query builders call this several times per query. The decision is a
    * performance heuristic only (results are identical either way), and
    * the driver's inputs are immutable for the life of a session. */
  private val spreadMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Boolean]()

  def parquet(s: SparkSession, path: String): DataFrame = {
    val df = s.read.parquet(path)
    val want = s.sparkContext.defaultParallelism
    val spread = spreadMemo.computeIfAbsent((path, want),
      _ => df.rdd.getNumPartitions * 2 < want)
    if (spread) df.repartition(want) else df
  }
}
