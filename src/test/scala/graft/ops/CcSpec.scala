package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Connected components (large-star/small-star) vs a driver-side
  * union-find, on synthetic graphs and on the real near-dup pair set. */
class CcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("cc")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Driver-side union-find: node -> component min. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges if a != b) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def runCc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    ConnectedComponents.run(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain, cycle, star, forest, dup/reversed edges match union-find") {
    val graphs = Seq(
      // 20-chain: diameter 19, forces multiple contraction rounds
      (0L until 19L).map(i => (i, i + 1)),
      // two components + reversed and duplicate edges + self-loop
      Seq((5L, 3L), (3L, 5L), (3L, 9L), (9L, 9L), (20L, 21L), (21L, 22L),
        (22L, 20L), (5L, 3L)),
      // star with high-id hub
      (1L to 10L).map(i => (100L, i)),
      // empty
      Seq.empty[(Long, Long)]
    )
    for (g <- graphs) {
      val got = runCc(g)
      val want = unionFind(g.filter(e => e._1 != e._2))
      assert(got == want, s"graph $g: got $got want $want")
    }
  }

  test("seeded random graph matches union-find") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(400)((rnd.nextInt(250).toLong, rnd.nextInt(250).toLong))
      .filter(e => e._1 != e._2)
    assert(runCc(edges) == unionFind(edges))
  }

  test("driver fast path == distributed star contraction (r6)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val edges = (Seq.fill(500)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong)) ++
      (900L until 940L).map(i => (i, i + 1))).filter(e => e._1 != e._2)
    def get(maxDriver: Int): Map[Long, Long] =
      ConnectedComponents.run(edges.toDF("a", "b"), driverMaxEdges = maxDriver)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driverMaxEdges=0 forces the distributed loop on the same input
    assert(get(ConnectedComponents.DRIVER_MAX_EDGES) == get(0))
    assert(get(ConnectedComponents.DRIVER_MAX_EDGES) == unionFind(edges))
  }

  test("reliable-checkpoint option == localCheckpoint path") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val edges = (Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)) ++
      (500L until 540L).map(i => (i, i + 1))).filter(e => e._1 != e._2)
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
    val reliable = ConnectedComponents
      .run(edges.toDF("a", "b"), checkpointDir = Some(dir.toString))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == runCc(edges))
    // the reliable path actually wrote checkpoint files
    assert(java.nio.file.Files.list(dir).count() > 0)
  }

  private def sfDir: Option[String] =
    Seq("sf0.01", "sf0.001").map(s => s"/root/testdata/$s")
      .find(d => new java.io.File(s"$d/documents.parquet").exists)

  test("q25 dedup clusters == union-find over verified pairs + singletons") {
    val dir = sfDir
    assume(dir.isDefined, "driver testdata not present")
    val pairs = TextSim.minhashDedup(spark, dir.get)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val allDocs = graft.Tables.parquet(spark, s"${dir.get}/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val uf = unionFind(pairs)
    val wantCanon = allDocs.map(d => d -> uf.getOrElse(d, d)).toMap
    val wantSize = wantCanon.values.groupBy(identity).map { case (c, v) => c -> v.size.toLong }
    val got = TextSim.dedupClusters(spark, dir.get).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == allDocs.length)
    for ((d, c, n) <- got) {
      assert(wantCanon(d) == c, s"doc $d: canon $c want ${wantCanon(d)}")
      assert(wantSize(c) == n, s"doc $d: csize $n want ${wantSize(c)}")
    }
    assert(pairs.nonEmpty, "fixture should contain near-dup pairs")
    assert(got.exists(_._3 > 1), "expected at least one non-singleton cluster")
  }
}
