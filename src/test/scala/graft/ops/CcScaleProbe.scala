package graft.ops

import org.apache.spark.sql.SparkSession

/** Scale probe for the distributed connected components: a 200k-node
  * CHAIN (the diameter worst case — min-label propagation would need
  * 200k shuffle rounds; star contraction must converge in O(log^2 n))
  * plus ~1M random edges over clustered components, validated against a
  * driver union-find (probe-only collect — the edge list is the probe's
  * input, not a data-scale product). Run:
  *
  *   sbt "Test/runMain graft.ops.CcScaleProbe [<nChain>] [<nRand>]"
  *
  * Reports rounds-to-convergence via wall time, component count parity,
  * and exact per-node label parity.
  */
object CcScaleProbe {
  def main(args: Array[String]): Unit = {
    val nChain = if (args.nonEmpty) args(0).toInt else 200000
    val nRand = if (args.length > 1) args(1).toInt else 1000000
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // chain 0-1-2-...-(nChain-1); random edges clustered into 1000-node
    // id blocks above the chain (so components stay non-trivial), xorshift
    // for determinism
    val edges = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    for (i <- 1 until nChain) edges += ((i - 1).toLong -> i.toLong)
    var x = 88172645463325252L
    def nxt(): Long = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x }
    val base = nChain.toLong
    for (_ <- 0 until nRand) {
      val block = math.floorMod(nxt(), 400) * 1000L
      val a = base + block + math.floorMod(nxt(), 1000)
      val b = base + block + math.floorMod(nxt(), 1000)
      edges += (a -> b)
    }

    // driver truth: union-find
    val parent = new java.util.HashMap[Long, Long]()
    def find(v: Long): Long = {
      var r = v
      while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
      var c = v
      while (parent.getOrDefault(c, c) != c) {
        val p = parent.getOrDefault(c, c); parent.put(c, r); c = p
      }
      r
    }
    for ((a, b) <- edges if a != b) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    // run() contract: nodes with no non-self edge don't appear (callers
    // left-join and coalesce to self), so the truth set mirrors that
    val truth = edges.iterator.filter(e => e._1 != e._2)
      .flatMap(e => Iterator(e._1, e._2))
      .toSet[Long].map(v => v -> find(v)).toMap

    val t0 = System.nanoTime()
    val got = ConnectedComponents
      .run(edges.toSeq.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sec = (System.nanoTime() - t0) / 1e9
    val nComp = got.values.toSet.size
    val nCompTruth = truth.values.toSet.size
    val mismatches = truth.count { case (v, c) => got.get(v) != Some(c) }
    val ok = mismatches == 0 && nComp == nCompTruth
    println(f"[cc-probe] edges=${edges.size}%d nodes=${truth.size}%d " +
      f"chainDiameter=$nChain%d components=$nComp%d/$nCompTruth%d " +
      f"mismatches=$mismatches%d sec=$sec%.1f ok=$ok")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
