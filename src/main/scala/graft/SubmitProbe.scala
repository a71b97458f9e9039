package graft

import org.apache.spark.sql.SparkSession
import graft.engine.{SpatialConfig, SpatialJoin, SubGeom, RefEdge}

/** One spatial-join measurement under WHATEVER master spark-submit
  * provides — the north-rule deployment shape: `spark-submit` against a
  * real standalone cluster at N and then 4N executors
  * (scripts/submit_scaling.sh stands the cluster up, runs both levels,
  * and prints the scaling efficiency).
  *
  * Unlike [[SpatialChild]] (the bench's forked local[N] leg), this main
  * sets NO master and NO core count — cluster topology is entirely the
  * submitter's. It reads a pre-written SynthGeo parquet input, runs the
  * default-config self join twice (the first rep warms executor JITs and
  * the input page cache; both are printed), and reports executor/core
  * counts as seen by the driver for evidence.
  *
  * Usage: graft.SubmitProbe <inputParquet> [<shufflePartitions>]
  * Prints per rep: [submit] rep=<i> sec=<s> rels=<n> execs=<e> cores=<c>
  */
object SubmitProbe {
  def main(args: Array[String]): Unit = {
    val inputPath = args(0)
    val shuffle = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", shuffle.toString)
      // AQE off, same rationale as SpatialChild: the fused path
      // repartitions explicitly into mapPartitions, AQE only adds
      // re-planning latency to the measured window
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // total executor CPU across stages — the engine-intrinsic scaling
    // signal on a host whose wall times vary 1.5-4x with neighbor load
    // (same listener as SpatialChild)
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit =
          cpuNs.addAndGet(sc.stageInfo.taskMetrics.executorCpuTime)
      })
    val geoms = spark.read.parquet(inputPath).as[SubGeom]
    for (rep <- 1 to 2) {
      cpuNs.set(0L)
      val t0 = System.nanoTime()
      val rels = SpatialJoin
        .run(spark, geoms, spark.emptyDataset[RefEdge], SpatialConfig())
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftInternal.drainListenerBus(spark)
      // executor count = block managers minus the driver's own entry.
      // (The former statusTracker filter compared HOST against the id
      // string "driver" — normally a no-op, but in local mode host can
      // equal "driver" and both corrections would apply, off by one.)
      val execCount =
        math.max(spark.sparkContext.getExecutorMemoryStatus.size - 1, 0)
      // println goes to the submit log the script greps
      println(f"[submit] rep=$rep sec=$sec%.3f rels=$rels " +
        s"execs=$execCount " +
        s"cores=${spark.sparkContext.defaultParallelism} " +
        f"cpu=${cpuNs.get / 1e9}%.1f")
    }
    spark.stop()
  }
}
