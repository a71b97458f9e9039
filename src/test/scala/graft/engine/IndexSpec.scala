package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** SpatialIndex (persisted packed-geometry cache, reference `-c --cache`)
  * parity: every index path must reproduce SpatialJoin.run on the original
  * input exactly. */
class IndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var tmp: java.nio.file.Path = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("index-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    tmp = java.nio.file.Files.createTempDirectory("graft-index-spec")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    if (tmp != null) {
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete()
      }
      rm(tmp.toFile)
    }
  }

  private def fixture(name: String) = {
    val in = getClass.getResourceAsStream(s"/datasets/$name")
    require(in != null, s"missing fixture $name")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().toList finally src.close()
  }

  private def parse(lines: Seq[String]) = {
    val s = spark
    import s.implicits._
    Model.parseLines(spark, spark.createDataset(lines))
  }

  private def rels(df: DataFrame, dist: Boolean = false)
      : Set[(String, String, String)] = {
    val c = if (dist) "dist" else "predicate"
    df.selectExpr("a_id", s"cast($c as string)", "b_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
  }

  test("index selfJoin == run, predicates (packed path)") {
    val (geoms, refs) = parse(fixture("freiburg"))
    // dupMinPoints = -1: freiburg carries P9-eligible exact duplicates,
    // which (like authored refs) route run() and the index through the
    // general path; disabling the rewrite (output-invariant) keeps this
    // test on the packed fast path. The references test covers fallback.
    val cfg = SpatialConfig(dupMinPoints = -1)
    val path = s"$tmp/freiburg_pred"
    val meta = SpatialIndex.write(spark, geoms, refs, cfg, path)
    assert(meta.eligible, "freiburg should take the packed path")
    val got = rels(SpatialIndex.selfJoin(spark, path, cfg))
    val want = rels(SpatialJoin.run(spark, geoms, refs, cfg))
    assert(got.nonEmpty && got == want,
      s"missing=${(want -- got).take(3)} spurious=${(got -- want).take(3)}")
  }

  test("index selfJoin == run, distance mode") {
    val (geoms, refs) = parse(fixture("freiburg"))
    val cfg = SpatialConfig(mode = "distance", withinDist = 5000,
      dupMinPoints = -1)
    val path = s"$tmp/freiburg_dist"
    val meta = SpatialIndex.write(spark, geoms, refs, cfg, path)
    assert(meta.eligible)
    val got = rels(SpatialIndex.selfJoin(spark, path, cfg), dist = true)
    val want = rels(SpatialJoin.run(spark, geoms, refs, cfg), dist = true)
    assert(got.nonEmpty && got == want,
      s"missing=${(want -- got).take(3)} spurious=${(got -- want).take(3)}")
  }

  test("index selfJoin == run, de9im mode (packed path)") {
    val (geoms, refs) = parse(fixture("freiburg"))
    val cfg = SpatialConfig(mode = "de9im", dupMinPoints = -1)
    val path = s"$tmp/freiburg_de9im"
    val meta = SpatialIndex.write(spark, geoms, refs, cfg, path)
    assert(meta.eligible, "de9im runs fused since r3 — must take packed")
    val got = SpatialIndex.selfJoin(spark, path, cfg)
      .selectExpr("a_id", "de9im", "b_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val want = SpatialJoin.run(spark, geoms, refs, cfg)
      .selectExpr("a_id", "de9im", "b_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got.nonEmpty && got == want,
      s"missing=${(want -- got).take(3)} spurious=${(got -- want).take(3)}")
  }

  test("index mode mismatch is rejected") {
    val path = s"$tmp/freiburg_pred" // written by the predicates test
    intercept[IllegalArgumentException] {
      SpatialIndex.selfJoin(spark, path,
        SpatialConfig(mode = "distance", withinDist = 5000))
    }
  }

  test("probe join == two-sided run (index side 0, probe side 1)") {
    val s = spark
    import s.implicits._
    val lines = fixture("freiburg")
    val (evens, odds) = lines.zipWithIndex.partition(_._2 % 2 == 0)
    val (idxGeoms, idxRefs) = parse(evens.map(_._1))
    val (probeGeoms, _) = parse(odds.map(_._1))
    val cfg = SpatialConfig(dupMinPoints = -1)
    val path = s"$tmp/freiburg_sides"
    val meta = SpatialIndex.write(spark, idxGeoms, idxRefs, cfg, path)
    assert(meta.eligible && !meta.hasSides)
    val got = rels(SpatialIndex.join(spark, path, probeGeoms, cfg))
    // oracle: one run() over the union with explicit sides — the engine's
    // own (fixture-verified) non-self discipline
    val both = idxGeoms.unionByName(probeGeoms.map(_.copy(side = 1)))
    val want = rels(SpatialJoin.run(spark, both,
      spark.emptyDataset[RefEdge], cfg))
    assert(got.nonEmpty && got == want,
      s"missing=${(want -- got).take(3)} spurious=${(got -- want).take(3)}")
  }

  test("sp_index_join rows == sp_join_example rows") {
    val got = rels(SpatialQueries.queries("sp_index_join")(spark, ""))
    val want = rels(SpatialQueries.queries("sp_join_example")(spark, ""))
    assert(got.nonEmpty && got == want,
      s"missing=${(want -- got).take(3)} spurious=${(got -- want).take(3)}")
  }

  test("refs fixture falls back to the general path with identical rows") {
    val (geoms, refs) = parse(fixture("references"))
    val cfg = SpatialConfig()
    val path = s"$tmp/references"
    val meta = SpatialIndex.write(spark, geoms, refs, cfg, path)
    assert(!meta.eligible, "authored refs must force the raw fallback")
    val got = rels(SpatialIndex.selfJoin(spark, path, cfg))
    val want = rels(SpatialJoin.run(spark, geoms, refs, cfg))
    assert(got.nonEmpty && got == want,
      s"missing=${(want -- got).take(3)} spurious=${(got -- want).take(3)}")
  }
}
