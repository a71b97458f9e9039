package graft

import org.apache.spark.sql.SparkSession
import graft.engine.{SpatialConfig, SpatialJoin, SynthGeo}

/** One spatial-join measurement in a FRESH JVM (forked by [[Bench]]).
  *
  * Reusing a JVM across measurement legs contaminates them: a leg that
  * runs after another in the same process shows up to 4x inflated
  * executor CPU time for identical work (old-gen residue from the
  * previous session's Tungsten pages keeps GC barriers hot), which made
  * same-JVM scaling legs measure the JVM's history instead of the
  * engine. Forking restores t1/t4 to the per-stage CPU ratio.
  *
  * Usage: graft.SpatialChild <nGeoms> <cores> <shufflePartitions> <phase>
  * phase: full | skew | knn | index. Prints ONE line:
  * [child] sec=<s> rels=<n>
  */
object SpatialChild {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val cores = args(1).toInt
    val shuffle = args(2).toInt
    val phase = if (args.length > 3) args(3) else "full"
    // optional 5th arg: parquet path of a pre-generated input. The parent
    // bench writes the scaling input ONCE at full parallelism; a child leg
    // then pays a columnar read instead of regenerating the synthetic mix
    // on its own (possibly single) core — the 1-core 4M leg spent ~25 s
    // per rep on trig-heavy generation OUTSIDE the measured window but
    // INSIDE the scaling section's budget, halving how many min-of-N reps
    // fit. Input prep stays excluded from the measured window either way.
    val inputPath = if (args.length > 4) args(4) else ""
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shuffle.toString)
      // AQE off for the measurement legs: the fused path repartitions
      // explicitly and is consumed by mapPartitions, so AQE can neither
      // coalesce nor skew-split anything — it only adds per-exchange
      // re-planning latency and statistics collection (measured ~2.5-3
      // executor-CPU core-s and 1-2 s wall on the 4-core 2M leg)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("GRAFT_LOCAL_DIR", "/dev/shm/graft-spark"))
      .config("spark.shuffle.file.buffer", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // total executor CPU across stages: the engine-intrinsic scaling signal
    // (wall-time gaps between parallelism levels on this shared box are
    // dominated by the memory bus; CPU inflation isolates the contention
    // paid inside the engine). Reset after warmup so only the measured
    // window counts.
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit =
          cpuNs.addAndGet(sc.stageInfo.taskMetrics.executorCpuTime)
      })
    val refs = spark.emptyDataset[graft.engine.RefEdge]
    val (sec, rels) =
      if (phase == "knn") {
        // 1M-point kNN leg: expanding cell-ring search, 0.1% query sample
        val mkPts = (m: Long) => spark.range(m).select(
          col("id").as("gid"),
          (col("id") * 7919 % 2000001 - 1000000).as("x"),
          (col("id") * 104729 % 2000001 - 1000000).as("y"))
        graft.engine.Knn.pointKnn(spark, mkPts(20000),
          col("gid") % 100 === 0, 3).count() // warmup
        cpuNs.set(0L)
        val t0 = System.nanoTime()
        val c = graft.engine.Knn.pointKnn(spark, mkPts(n),
          col("gid") % 1000 === 0, 3).count()
        ((System.nanoTime() - t0) / 1e9, c)
      } else {
        // JIT warmup, identical for every leg so it cancels in ratios
        SpatialJoin.run(spark, SynthGeo.dataset(spark, 20000), refs,
          SpatialConfig()).count()
        val geoms =
          if (phase == "skew") SynthGeo.skewDataset(spark, n)
          else if (inputPath.nonEmpty)
            spark.read.parquet(inputPath).as[graft.engine.SubGeom]
          else SynthGeo.dataset(spark, n)
        // materialize the synthetic INPUT before the measured window (the
        // reference's headline number likewise excludes input parsing,
        // README.md:7-9); run() reuses the cache instead of re-persisting
        geoms.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          .count()
        // codegen warmup with the MEASURED run's plan source: the cover
        // chain embeds the cell size and active-level set as literals, so
        // the generic 20k warmup above compiles a DIFFERENT source and the
        // measured window still paid 0.5-1 s of driver-side Janino
        // compilation (pure fixed cost, worst for the high-parallelism
        // scaling leg). Resolving the spec here costs two small agg jobs
        // OUTSIDE the window; run() still performs its own stats pass
        // inside the measured window as always.
        if (phase == "index") {
          // persisted-index leg: the write (parse/pad/encode/stats) runs
          // OUTSIDE the window; the measured cost is packed-parquet read →
          // cover → shuffle → kernel. The gap to the `full` leg is what a
          // query batch saves per reuse of a write-once index.
          val base = sys.env.getOrElse("GRAFT_LOCAL_DIR",
            "/dev/shm/graft-spark")
          val idxPath = s"$base/bench_index_${n}_$cores"
          graft.engine.SpatialIndex.write(spark, geoms, refs,
            SpatialConfig(), idxPath)
          // codegen warmup with the measured plan's literals: a small index
          // at the SAME cell size compiles the same cover source
          val meta = graft.engine.SpatialIndex.readMeta(spark, idxPath)
          val warmCfg = SpatialConfig(cellSize = meta.cellSize)
          val wPath = idxPath + "_warm"
          graft.engine.SpatialIndex.write(spark,
            SynthGeo.dataset(spark, 20000), refs, warmCfg, wPath)
          graft.engine.SpatialIndex.selfJoin(spark, wPath, warmCfg).count()
          cpuNs.set(0L)
          val t0 = System.nanoTime()
          val c = graft.engine.SpatialIndex
            .selfJoin(spark, idxPath, SpatialConfig()).count()
          val dt = (System.nanoTime() - t0) / 1e9
          for (p <- Seq(idxPath, wPath)) {
            def rm(f: java.io.File): Unit = {
              val cs = f.listFiles(); if (cs != null) cs.foreach(rm)
              f.delete()
            }
            rm(new java.io.File(p))
          }
          (dt, c)
        } else {
          if (!sys.env.get("GRAFT_PLAN_WARM").contains("off")) {
            val (cfgR, lvlsR, _) =
              SpatialJoin.coverSpec(geoms, SpatialConfig())
            SpatialJoin.fusedPairs(spark, SynthGeo.dataset(spark, 20000),
              cfgR, lvlsR, direct = true).count()
          }
          cpuNs.set(0L)
          val t0 = System.nanoTime()
          val c = SpatialJoin.run(spark, geoms, refs,
            SpatialConfig()).count()
          ((System.nanoTime() - t0) / 1e9, c)
        }
      }
    // stage-completion events arrive on the async listener bus; give it a
    // beat before reading the total (same approach as SpatialBench)
    Thread.sleep(500)
    println(s"[child] sec=$sec rels=$rels cpu=${cpuNs.get() / 1e9}")
    spark.stop()
  }
}
