package graft.geom

import graft.engine.{Model, SynthGeo}

/** No-Spark per-kind relate() micro-bench over bbox-OVERLAPPING synthetic
  * pairs (the candidate stream the fused kernel actually refines). Pairs are
  * found by a coarse grid over SynthGeo output, like the engine's cell join.
  * Usage: Test/runMain graft.geom.KindBench [nGeoms] [reps]
  */
object KindBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 120000
    val reps = if (args.length > 1) args(1).toInt else 3
    val rows = (0 until n).map(i => SynthGeo.make(42L, i.toLong)).toArray
    val gs = rows.map(r => Model.toG(r.kind, r.coords, r.ringEnds))
    // coarse grid pairing on bbox overlap
    val cell = 400000
    val buckets = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.ArrayBuffer[Int]]
    for (i <- gs.indices) {
      val g = gs(i)
      var cx = g.minX / cell
      while (cx <= g.maxX / cell) {
        var cy = g.minY / cell
        while (cy <= g.maxY / cell) {
          buckets.getOrElseUpdate(cx.toLong << 32 | (cy & 0xffffffffL),
            new scala.collection.mutable.ArrayBuffer[Int]) += i
          cy += 1
        }
        cx += 1
      }
    }
    val seen = scala.collection.mutable.HashSet.empty[Long]
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    for (b <- buckets.values; ai <- b.indices; bi <- ai + 1 until b.length) {
      val i = b(ai); val j = b(bi)
      val key = math.min(i, j).toLong << 32 | math.max(i, j)
      if (!seen(key) && gs(i).bboxIntersects(gs(j))) {
        seen += key
        pairs += ((i, j))
      }
    }
    val byKind = pairs.groupBy { case (i, j) => (gs(i).kind, gs(j).kind) }
    println(s"n=$n overlapping pairs=${pairs.length}")
    for (((ka, kb), ps) <- byKind.toSeq.sortBy(p => p._1)) {
      val arr = ps.toArray
      // warmup
      var acc = 0
      for (_ <- 0 until 2; (i, j) <- arr)
        if (Relate.relate(gs(i), gs(j)).isect) acc += 1
      var best = Double.MaxValue
      var hits = 0
      for (_ <- 0 until reps) {
        val t0 = System.nanoTime()
        var k = 0; hits = 0
        while (k < arr.length) {
          val (i, j) = arr(k)
          if (Relate.relate(gs(i), gs(j)).isect) hits += 1
          k += 1
        }
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < best) best = dt
      }
      println(f"[kind] ${ka}x$kb n=${arr.length}%8d best=$best%7.3f s " +
        f"us_each=${best / arr.length * 1e6}%8.2f hits=$hits (warm acc=$acc)")
    }
  }
}
