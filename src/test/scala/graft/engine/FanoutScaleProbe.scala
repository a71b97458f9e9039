package graft.engine

import org.apache.spark.sql.SparkSession

/** Scale probe for the round-3 distributed ref/dup fanout: the driver-
  * collected/broadcast closure path must agree with the fully distributed
  * reroute (`run()` past `maxDriverEdges`) at edge volumes far beyond the
  * fixtures — and the distributed leg must complete with a flat driver
  * (no 10^6-element RefEdge array ever materializes on it). Run:
  *
  *   sbt "Test/runMain graft.engine.FanoutScaleProbe [<nBase>] [<nAliases>]"
  *
  * Leg 1 — authored refs: nAliases alias ids (default 1M) each referencing
  * one of nBase SynthGeo geometries; every relation of a referenced
  * geometry fans to its aliases on both sides plus alias self-relations.
  * Leg 2 — P9 duplicates: a slice of the base duplicated 6x (exact coord
  * copies), dupMinPoints=0; the dup scan rewrites copies to references.
  * Both legs compare the driver path (cap above the edge count) against
  * the distributed path (cap below it) by exact row-set equality, checked
  * distributively (except both ways — nothing data-sized is collected).
  */
object FanoutScaleProbe {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.nonEmpty) args(0).toLong else 300000L
    val nAlias = if (args.length > 1) args(1).toLong else 1000000L
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._

    var bad = false
    def compare(tag: String, runA: => org.apache.spark.sql.DataFrame,
        runB: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val a = runA.persist(); val nA = a.count()
      val tA = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val b = runB.persist(); val nB = b.count()
      val tB = (System.nanoTime() - t1) / 1e9
      val onlyA = a.except(b).count(); val onlyB = b.except(a).count()
      val heapMb = (Runtime.getRuntime.totalMemory() -
        Runtime.getRuntime.freeMemory()) / (1 << 20)
      val ok = onlyA == 0 && onlyB == 0 && nA == nB && nA > 0
      println(f"[fanout-probe] $tag driver=$nA%d rows/$tA%.1f s " +
        f"distributed=$nB%d rows/$tB%.1f s onlyA=$onlyA onlyB=$onlyB " +
        f"heapAfter=${heapMb}MB " + (if (ok) "OK" else "DIVERGED"))
      if (!ok) bad = true
      a.unpersist(); b.unpersist()
    }

    // ---- leg 1: authored aliases at nAlias edges --------------------
    val base = SynthGeo.dataset(spark, nBase).persist()
    base.count()
    val refs = spark.range(nAlias).map(i =>
      RefEdge(s"al$i", 0, s"g${i % nBase}", 0, 1, 0))
    compare(s"authored-refs n=$nBase aliases=$nAlias",
      SpatialJoin.run(spark, base, refs,
        SpatialConfig(maxDriverEdges = Int.MaxValue)),
      SpatialJoin.run(spark, base, refs,
        SpatialConfig(maxDriverEdges = (nAlias / 2).toInt)))

    // ---- leg 2: P9 duplicates (exact copies, dupMinPoints=0) --------
    val copies = base.filter(g => (g.gid.hashCode & 7) == 0)
      .flatMap(g => (1 to 6).map(k => g.copy(gid = g.gid + "_c" + k)))
    val withDups = base.union(copies).persist()
    withDups.count()
    val nDup = copies.count()
    println(s"[fanout-probe] duplicate copies: $nDup")
    compare(s"p9-duplicates n=$nBase copies=$nDup",
      SpatialJoin.run(spark, withDups, spark.emptyDataset[RefEdge],
        SpatialConfig(dupMinPoints = 0, maxDriverEdges = Int.MaxValue)),
      SpatialJoin.run(spark, withDups, spark.emptyDataset[RefEdge],
        SpatialConfig(dupMinPoints = 0, maxDriverEdges = 1000)))

    spark.stop()
    if (bad) sys.exit(1)
  }
}
