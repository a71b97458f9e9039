package graft.engine

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import scala.io.Source

/** Multi-executor execution proof (VERDICT r3 "Next round #1").
  *
  * Every prior round ran the engine in ONE JVM (`local[N]`), where closure
  * serialization, block-manager transfers and executor-side JVM state are
  * never actually exercised. This spec runs the full pipeline under
  * `local-cluster[2,4,2048]` — a real standalone master with two FORKED
  * executor JVMs — and requires results byte-identical to local mode:
  *
  *   - reference fixtures through `SpatialJoin.run` (pred / de9im /
  *     distance modes, `<refs>` fanout, MULTI* collections, non-self side
  *     discipline),
  *   - a SynthGeo self-join through `run()` (fused kernel direct path),
  *   - fused-vs-general differential INSIDE the cluster,
  *   - kNN (per-round `localCheckpoint` whose blocks live on executors),
  *   - connected components (iterative `localCheckpoint` fixpoint).
  *
  * The standalone worker writes its app dirs under `target/spark-home/work`
  * (a repo-local SPARK_HOME shim whose `jars` symlinks the real
  * distribution) so nothing outside the repo is touched. The executor JVMs
  * get the test JVM's classpath via Spark's own `spark.testing`
  * java.class.path forwarding, plus the JDK-17 --add-opens set that
  * spark-submit would normally inject.
  */
class ClusterParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  /** SynthGeo size for the run()-level leg; GRAFT_CLUSTER_N=1000000 is the
    * recorded large-probe configuration (BASELINE.md). */
  private val synthN = sys.env.getOrElse("GRAFT_CLUSTER_N", "150000").toLong

  private val fixtureLegs = Seq(
    ("freiburg", "pred"), ("freiburg", "de9im"), ("freiburg", "dist5000"),
    ("references", "pred"), ("multitests", "pred"),
    ("collectiontests", "pred"), ("brandenburg_nonself", "pred"))

  // ---- cluster-phase results (computed once in beforeAll) ---------------
  private var cFix: Map[(String, String), Set[String]] = _
  private var cSynth: Set[String] = _
  private var cKnn: Set[String] = _
  private var cCc: Set[String] = _
  private var cSoak: Option[String] = _
  private var cExecs = 0

  private var spark: SparkSession = _ // local compare side
  private val localFixCache =
    scala.collection.mutable.Map.empty[(String, String), Set[String]]

  // JavaModuleOptions.defaultModuleOptions(): spark-submit injects these on
  // JDK 17; forked standalone executors need them explicitly (build.sbt
  // supplies them only to the driver/test JVM).
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  private def resource(path: String): Seq[String] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    val src = Source.fromInputStream(in, "UTF-8")
    try src.getLines().toList finally src.close()
  }

  /** reference formatFloat(dist, 4) — same rule as FixtureSpec. */
  private def fmtDist(d: Double): String = {
    val s = f"$d%.4f"
    val t = s.reverse.dropWhile(_ == '0').reverse
    if (t.endsWith(".")) t.dropRight(1) else t
  }

  private def cfgFor(dataset: String, mode: String): SpatialConfig = {
    val selfJoin = !dataset.endsWith("_nonself")
    mode match {
      case "pred" => SpatialConfig(selfJoin = selfJoin, dupMinPoints = 0)
      case "de9im" =>
        SpatialConfig(mode = "de9im", selfJoin = selfJoin, dupMinPoints = 0)
      case "dist5000" =>
        SpatialConfig(mode = "distance", withinDist = 5000,
          selfJoin = selfJoin, dupMinPoints = 0)
    }
  }

  /** Full relation set of a fixture dataset, formatted byte-identically to
    * the reference's output lines (same shape FixtureSpec pins). */
  private def fixtureRels(s: SparkSession, dataset: String, mode: String)
      : Set[String] = {
    val lines = resource(s"/datasets/$dataset")
    val ds = s.createDataset(lines)(org.apache.spark.sql.Encoders.STRING)
    val (geoms, refs) = Model.parseLines(s, ds)
    val cfg = cfgFor(dataset, mode)
    SpatialJoin.run(s, geoms, refs, cfg).collect().map { r =>
      val mid = cfg.mode match {
        case "distance" => "\t" + fmtDist(r.getDouble(1)) + "\t"
        case "de9im" => "\t" + r.getString(1) + "\t"
        case _ => " " + r.getString(1) + " "
      }
      r.getString(0) + mid + r.getString(2)
    }.toSet
  }

  private def rowSet(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("")).toSet

  private def synthRels(s: SparkSession): Set[String] = {
    import s.implicits._
    val geoms = SynthGeo.dataset(s, synthN, 42L)
    rowSet(SpatialJoin.run(s, geoms, s.emptyDataset[RefEdge])
      .select(col("a_id"), col("predicate"), col("b_id")))
  }

  private def knnRels(s: SparkSession): Set[String] = {
    val pts = SynthGeo.dataset(s, 20000L, 11L).filter(_.kind == 0)
      .toDF().select(col("gid"), col("minX").as("x"), col("minY").as("y"))
    rowSet(Knn.pointKnn(s, pts, hash(col("gid")) % 50 === 0, 3))
  }

  private def ccEdges: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(5000)((rnd.nextInt(2000).toLong, rnd.nextInt(2000).toLong)) ++
      // a 1000-node chain: forces several large-star/small-star rounds
      (0L until 999L).map(i => (10000L + i, 10001L + i))
  }

  private def ccRels(s: SparkSession): Set[String] = {
    import s.implicits._
    rowSet(graft.ops.ConnectedComponents.run(ccEdges.toDF("a", "b")))
  }

  /** Fused kernel vs general candidates+refine+aggregate, both in-cluster:
    * the DifferentialSoak invariant under real executor JVMs. */
  private def soakLeg(s: SparkSession): Option[String] = {
    import s.implicits._
    def rels(df: DataFrame): Set[String] =
      rowSet(df.selectExpr("a_id", "cast(predicate as string)", "b_id"))
    val geoms = SynthGeo.dataset(s, 20000L, 7L).cache()
    try {
      val (cfg, lvls, _) =
        SpatialJoin.coverSpec(geoms, SpatialConfig(dupMinPoints = -1))
      val fused = rels(SpatialJoin.aggregateFromPre(s,
        SpatialJoin.fusedPairs(s, geoms, cfg, lvls), cfg))
      val general = rels(SpatialJoin.aggregate(s,
        SpatialJoin.refine(s,
          SpatialJoin.candidates(s, geoms, cfg, lvls), cfg),
        cfg, hadRefs = false, mayHaveBigMultis = false))
      if (fused == general && fused.nonEmpty) None
      else Some(s"fusedOnly=${(fused -- general).take(3)} " +
        s"generalOnly=${(general -- fused).take(3)} n=${fused.size}")
    } finally geoms.unpersist()
  }

  override def beforeAll(): Unit = {
    // repo-local SPARK_HOME shim: real jars, repo-local work dir
    val home = Paths.get("target", "spark-home").toAbsolutePath
    Files.createDirectories(home)
    val jars = home.resolve("jars")
    if (!Files.exists(jars))
      Files.createSymbolicLink(jars, Paths.get("/opt/spark/jars"))
    // AbstractCommandBuilder.getScalaVersion probes for a dev-tree build
    // dir when SPARK_SCALA_VERSION isn't in the env (load-spark-env.sh
    // normally sets it); give it the marker it wants
    Files.createDirectories(home.resolve("launcher/target/scala-2.13"))
    sys.props("spark.testing") = "true"
    sys.props("spark.test.home") = home.toString

    val cluster = SparkSession.builder()
      .master("local-cluster[2,4,2048]")
      .appName("cluster-parity")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.extraJavaOptions", addOpens)
      .getOrCreate()
    cluster.sparkContext.setLogLevel("ERROR")
    try {
      cFix = fixtureLegs.map { case (d, m) =>
        (d, m) -> fixtureRels(cluster, d, m)
      }.toMap
      cSynth = synthRels(cluster)
      cSoak = soakLeg(cluster)
      cKnn = knnRels(cluster)
      cCc = ccRels(cluster)
      cExecs = cluster.sparkContext.statusTracker.getExecutorInfos
        .count(_.host() != null) - 1 // minus the driver entry
    } finally {
      cluster.stop()
      sys.props.remove("spark.testing")
      sys.props.remove("spark.test.home")
    }

    spark = SparkSession.builder()
      .master("local[8]")
      .appName("cluster-parity-local")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("cluster phase ran on >= 2 forked executor JVMs") {
    assert(cExecs >= 2, s"expected >=2 executors, saw $cExecs")
  }

  for ((d, m) <- fixtureLegs)
    test(s"$d [$m] relations byte-identical: local-cluster vs local") {
      val local = localFixCache
        .getOrElseUpdate((d, m), fixtureRels(spark, d, m))
      val c = cFix((d, m))
      assert(c.nonEmpty, "cluster produced no relations")
      val missing = (local -- c).take(3)
      val spurious = (c -- local).take(3)
      assert(c == local,
        s"missing=${missing.mkString("; ")} spurious=${spurious.mkString("; ")}")
    }

  test(s"SynthGeo $synthN self-join via run() byte-identical") {
    val local = synthRels(spark)
    assert(cSynth.nonEmpty && cSynth == local,
      s"cluster=${cSynth.size} local=${local.size} " +
        s"diff=${(cSynth diff local).take(3)} ${(local diff cSynth).take(3)}")
  }

  test("fused and general paths agree inside the cluster") {
    assert(cSoak.isEmpty, cSoak.getOrElse(""))
  }

  test("kNN (localCheckpoint blocks on executors) byte-identical") {
    val local = knnRels(spark)
    assert(cKnn.nonEmpty && cKnn == local,
      s"cluster=${cKnn.size} local=${local.size}")
  }

  test("connected components (iterative localCheckpoint) byte-identical") {
    val local = ccRels(spark)
    assert(cCc.nonEmpty && cCc == local,
      s"cluster=${cCc.size} local=${local.size}")
  }

  test("kNN reliable-checkpoint option == localCheckpoint path") {
    val dir = Files.createTempDirectory("graft-knn-ckpt")
    val pts = SynthGeo.dataset(spark, 20000L, 11L).filter(_.kind == 0)
      .toDF().select(col("gid"), col("minX").as("x"), col("minY").as("y"))
    val reliable = rowSet(Knn.pointKnn(spark, pts,
      hash(col("gid")) % 50 === 0, 3, Some(dir.toString)))
    assert(reliable.nonEmpty && reliable == knnRels(spark))
    assert(java.nio.file.Files.list(dir).count() > 0)
  }
}
