package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{SpatialConfig, SpatialJoin, SubGeom, RefEdge}

/** One spatial-join measurement under WHATEVER master spark-submit
  * provides — the north-rule deployment shape: `spark-submit` against a
  * real standalone cluster at N and then 4N executors
  * (scripts/submit_scaling.sh stands the cluster up, runs both levels,
  * and prints the scaling efficiency; scripts/submit_cluster_bench.sh
  * adds the multi-core-executor headline twin and the skew leg).
  *
  * Unlike [[SpatialChild]] (the bench's forked local[N] leg), this main
  * sets NO master and NO core count — cluster topology is entirely the
  * submitter's. It reads a pre-written SynthGeo parquet input (regular or
  * skew, see [[WriteInput]]), runs the default-config self join twice
  * (the first rep warms executor JITs and the input page cache; both are
  * printed), and reports per rep:
  *
  *   - `fp` — an order-independent xor fingerprint over the canonical
  *     relation rows: equal fp across topologies = byte-identical output
  *     (the across-JVM parity evidence, not just equal counts);
  *   - `execs`/`cores` as seen by the driver;
  *   - `spread` — per-executor total task time max/median: the skew-leg
  *     straggler signal (a value near 1.0 means the level-native/visitor
  *     cover split kept the giant polygon's work balanced across
  *     executor JVMs).
  *
  * Usage: graft.SubmitProbe <inputParquet> [<shufflePartitions>]
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
    // (same listener as SpatialChild) — plus per-executor task-time
    // totals for the straggler spread
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    val perExec = new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicLong]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit =
          cpuNs.addAndGet(sc.stageInfo.taskMetrics.executorCpuTime)
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskInfo != null && te.taskMetrics != null)
            perExec.computeIfAbsent(te.taskInfo.executorId,
              _ => new java.util.concurrent.atomic.AtomicLong(0L))
              .addAndGet(te.taskMetrics.executorRunTime)
      })
    val geoms = spark.read.parquet(inputPath).as[SubGeom]
    for (rep <- 1 to 2) {
      cpuNs.set(0L)
      perExec.clear()
      val t0 = System.nanoTime()
      val rels = SpatialJoin
        .run(spark, geoms, spark.emptyDataset[RefEdge], SpatialConfig())
      // one aggregation job computes the count AND an order-independent
      // output fingerprint (xor of per-row xxhash64 over the canonical
      // row string). Equal fp + equal count across topologies is strong
      // evidence of identical output, not proof: an xor fold cancels
      // even-multiplicity differences and concat_ws skips NULL columns
      // (ADVICE r5) — the hash-oracle parity gates are the real proof.
      val row = rels
        .select(xxhash64(concat_ws("|",
          rels.columns.toIndexedSeq.map(c => col(c).cast("string")): _*))
          .as("h"))
        .agg(count(lit(1)).as("n"),
          // coalesce: bit_xor over zero rows is NULL — the probe must
          // print rels=0 fp=0 instead of throwing (ADVICE r5)
          expr("coalesce(bit_xor(h), 0L)").as("fp"))
        .head()
      val (nRels, fp) = (row.getLong(0), row.getLong(1))
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftInternal.drainListenerBus(spark)
      // executor count = block managers minus the driver's own entry.
      // (The former statusTracker filter compared HOST against the id
      // string "driver" — normally a no-op, but in local mode host can
      // equal "driver" and both corrections would apply, off by one.)
      val execCount =
        math.max(spark.sparkContext.getExecutorMemoryStatus.size - 1, 0)
      import scala.jdk.CollectionConverters._
      val totals = perExec.asScala.toSeq
        .map { case (id, v) => (id, v.get / 1e3) }.sortBy(_._1)
      val spread =
        if (totals.size < 2) 1.0
        else {
          val ts = totals.map(_._2).sorted
          val med = ts(ts.size / 2)
          if (med <= 0) 1.0 else ts.last / med
        }
      // println goes to the submit log the script greps
      println(f"[submit] rep=$rep sec=$sec%.3f rels=$nRels " +
        f"fp=$fp%016x execs=$execCount " +
        s"cores=${spark.sparkContext.defaultParallelism} " +
        f"cpu=${cpuNs.get / 1e9}%.1f spread=$spread%.2f " +
        s"exec_task_s=${totals.map(t => f"${t._2}%.1f").mkString(",")}")
    }
    spark.stop()
  }
}
