package graft.geom

import graft.engine.{Model, SynthGeo}

/** No-Spark kernel micro-benchmark: relate() over synthetic pairs. */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = 200000
    val geoms = (0 until n).map(i => SynthGeo.make(42L, i.toLong)).toArray
    // pair nearby geometries (same town cluster => realistic candidates)
    val byTown = geoms.groupBy(g => (g.minX / 1000000, g.minY / 1000000))
    val pairs = byTown.values.flatMap { arr =>
      arr.sliding(2).collect { case Array(x, y) => (x, y) }
    }.toArray
    println(s"pairs=${pairs.length}")
    val gs = pairs.map { case (a, b) =>
      (Model.toG(a.kind, a.coords, a.ringEnds),
        Model.toG(b.kind, b.coords, b.ringEnds))
    }
    // warmup
    var acc = 0
    for (_ <- 0 until 2; (ga, gb) <- gs)
      if (Relate.relate(ga, gb).isect) acc += 1
    val t0 = System.nanoTime()
    var i = 0
    var hits = 0
    while (i < gs.length) {
      val (ga, gb) = gs(i)
      if (Relate.relate(ga, gb).isect) hits += 1
      i += 1
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"relate: ${gs.length} pairs in $dt%.3f s = " +
      f"${dt / gs.length * 1e6}%.2f us/pair (hits=$hits acc=$acc)")
    // fresh-G variant (cache-miss cost: rebuild G per pair)
    val t1 = System.nanoTime()
    i = 0
    while (i < pairs.length) {
      val (a, b) = pairs(i)
      val ga = Model.toG(a.kind, a.coords, a.ringEnds)
      val gb = Model.toG(b.kind, b.coords, b.ringEnds)
      if (Relate.relate(ga, gb).isect) hits += 1
      i += 1
    }
    val dt1 = (System.nanoTime() - t1) / 1e9
    println(f"relate+build: $dt1%.3f s = ${dt1 / pairs.length * 1e6}%.2f us/pair")
  }
}
