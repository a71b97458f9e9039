package graft.engine

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.geom.Geo

/** Deterministic OSM-like geometry generator for benchmarks (FIXTURES.md §4):
  * jittered building-like polygons (some with holes), road-like linestring
  * walks, and point clouds, clustered over a country-sized bbox so the
  * self-join has realistic overlap density. Pure function of (seed, id) via
  * splitmix64 — no RNG state, safe to regenerate per partition.
  */
object SynthGeo {

  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** uniform double in [0,1) from (seed, id, salt). */
  private def u(seed: Long, id: Long, salt: Long): Double =
    ((mix(seed ^ mix(id) ^ (salt * 0x632be59bd9b4e019L)) >>> 11) *
      (1.0 / (1L << 53)))

  // country-ish bbox: lon 5..15, lat 47..55
  private final val LON0 = 5.0; private final val LONW = 10.0
  private final val LAT0 = 47.0; private final val LATH = 8.0

  /** Town count scales with n above 1M so geometry DENSITY (and thus output
    * relations per geometry) stays constant as the benchmark grows — with a
    * fixed town count the pair count grows quadratically and any scaling
    * measurement just measures output explosion. n <= ~1M keeps the
    * round-1-comparable 1024 towns. */
  def townsFor(n: Long): Int = math.max(1024L, n / 1000L).toInt

  def make(seed: Long, id: Long, nTowns: Int = 1024): SubGeom = {
    // cluster centers: geometries scatter near a town
    val town = (u(seed, id, 1) * nTowns).toInt
    val tLon = LON0 + u(seed, town, 101) * LONW
    val tLat = LAT0 + u(seed, town, 102) * LATH
    val cLon = tLon + (u(seed, id, 2) - 0.5) * 0.1
    val cLat = tLat + (u(seed, id, 3) - 0.5) * 0.1
    val kind = u(seed, id, 4)
    val g: Geo.G =
      if (kind < 0.60) { // point
        Geo.G.point(Geo.projX(cLon), Geo.projY(cLat))
      } else if (kind < 0.80) { // road-like walk
        val n = 4 + (u(seed, id, 5) * 28).toInt
        val cs = new Array[Int](2 * n)
        var lon = cLon; var lat = cLat
        var i = 0
        while (i < n) {
          cs(2 * i) = Geo.projX(lon); cs(2 * i + 1) = Geo.projY(lat)
          lon += (u(seed, id, 10 + i) - 0.5) * 0.004
          lat += (u(seed, id, 50 + i) - 0.5) * 0.004
          i += 1
        }
        Geo.G.line(cs)
      } else { // building/landuse-like polygon (jittered n-gon); vertex
        // counts follow an OSM-ish skew: most small, some detailed
        val det = u(seed, id, 9)
        val n =
          if (det < 0.7) 4 + (u(seed, id, 6) * 12).toInt
          else if (det < 0.95) 16 + (u(seed, id, 6) * 48).toInt
          else 64 + (u(seed, id, 6) * 192).toInt
        val r = 0.0005 + u(seed, id, 7) * 0.01 // 50 m .. 1 km ish
        def ring(rr: Double, off: Int): Array[Int] = {
          val cs = new Array[Int](2 * n)
          var i = 0
          while (i < n) {
            val ang = 2 * math.Pi * i / n
            val jit = 0.7 + 0.6 * u(seed, id, off + i)
            cs(2 * i) = Geo.projX(cLon + math.cos(ang) * rr * jit)
            cs(2 * i + 1) = Geo.projY(cLat + math.sin(ang) * rr * jit * 0.7)
            i += 1
          }
          cs
        }
        val rings =
          if (u(seed, id, 8) < 0.1) Array(ring(r, 100), ring(r * 0.3, 200))
          else Array(ring(r, 100))
        Geo.G.polygon(rings)
      }
    SubGeom(s"g$id", 0, 0, 1, g.kind, g.coords, g.ringEnds,
      g.minX, g.minY, g.maxX, g.maxY)
  }

  /** Skew probe input: one continent-sized polygon covering the whole
    * generator bbox plus n points — the worst case for any broadcast-big
    * design (the giant pairs with EVERY point). With the multi-level cell
    * cover the giant sits at a coarse level with a bounded cover and every
    * point emits one extra row at that level; memory stays flat. */
  def skewDataset(spark: SparkSession, n: Long, seed: Long = 42L)
      : Dataset[SubGeom] = {
    import spark.implicits._
    val nVerts = 512
    val ring = new Array[Int](2 * nVerts)
    var i = 0
    while (i < nVerts) {
      val ang = 2 * math.Pi * i / nVerts
      // ellipse inscribed over the full country bbox, vertices jittered
      val jit = 0.9 + 0.1 * u(seed, i, 7001)
      ring(2 * i) = Geo.projX(LON0 + LONW / 2 + math.cos(ang) * LONW * jit)
      ring(2 * i + 1) = Geo.projY(LAT0 + LATH / 2 + math.sin(ang) * LATH * jit)
      i += 1
    }
    val giant = Geo.G.polygon(Array(ring))
    val giantRow = SubGeom("continent", 0, 0, 1, 2, giant.coords,
      giant.ringEnds, giant.minX, giant.minY, giant.maxX, giant.maxY)
    val pts = spark.range(0, n, 1,
      spark.sparkContext.defaultParallelism * 2).map { id =>
      val nTowns = townsFor(n)
      val g = make(seed, id, nTowns)
      g
    }.filter(_.kind == 0)
    pts.union(spark.createDataset(Seq(giantRow)))
  }

  def dataset(spark: SparkSession, n: Long, seed: Long = 42L,
      partitions: Int = 0): Dataset[SubGeom] = {
    import spark.implicits._
    val parts = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism * 2
    val nTowns = townsFor(n)
    spark.range(0, n, 1, parts).map(id => make(seed, id, nTowns))
  }
}
