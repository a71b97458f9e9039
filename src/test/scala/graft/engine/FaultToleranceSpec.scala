package graft.engine

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Executor-loss fault injection (VERDICT r4 "Next round #1").
  *
  * ClusterParitySpec proves byte-identical results on a HEALTHY
  * local-cluster; this spec injects the cluster's defining failure — an
  * executor JVM dying mid-job — and proves the engine's recovery story:
  *
  *   - a long fused spatial join survives a SIGKILL of one executor JVM
  *     mid-run (lost shuffle files + lost MEMORY_AND_DISK cache blocks →
  *     stage retry + lineage recompute) with byte-identical relations;
  *   - connected components with the reliable `checkpointDir` option
  *     survives a SIGKILL mid-rounds (lost executors recompute carried
  *     state from checkpoint FILES, not lost executor blocks);
  *   - kNN with `checkpointDir` survives a SIGKILL mid-ring the same way;
  *   - the documented localCheckpoint failure mode: WITHOUT checkpointDir
  *     a mid-rounds kill may fail the job (truncated lineage + lost
  *     blocks) — but must NEVER complete with silently wrong output.
  *
  * The kill is a real `destroyForcibly()` (SIGKILL) of a forked
  * CoarseGrainedExecutorBackend process, armed by a task-completion
  * listener so it provably lands while the leg's job is executing; the
  * standalone master relaunches a replacement executor, exactly as a real
  * cluster manager would. This is the Spark-native replacement for the
  * reference's single-process durability design (Sweeper.h:253-266
  * unlinked temp event file): there, one process owns all state; here,
  * state either has lineage or lives in reliable checkpoint files.
  */
class FaultToleranceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var cluster: SparkSession = _
  private var local: SparkSession = _

  // JDK-17 opens the forked executors need (see ClusterParitySpec).
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  // ---------------------------------------------------------- kill plumbing
  private def executorProcs(): Seq[ProcessHandle] = {
    import scala.jdk.CollectionConverters._
    // ProcessHandle.info().commandLine() truncates on Linux and the
    // executor command line starts with a ~100 KB -cp list, so the
    // trailing main-class name never survives — read /proc directly
    def isExecutor(p: ProcessHandle): Boolean =
      try new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"/proc/${p.pid()}/cmdline")), "UTF-8")
        .contains("CoarseGrainedExecutorBackend")
      catch {
        case _: Throwable => p.info().commandLine().orElse("")
          .contains("CoarseGrainedExecutorBackend")
      }
    ProcessHandle.current().descendants().iterator().asScala
      .filter(p => p.isAlive && isExecutor(p)).toSeq
  }

  /** Arms a one-shot executor SIGKILL that fires after `minTasks` task
    * completions are observed on `s` — i.e. provably while the leg's job
    * is running. The kill runs off the listener bus; `killedPid` reports
    * which JVM died (-1 = never fired, the leg finished too fast). */
  private final class Killer(s: SparkSession, minTasks: Int) {
    @volatile var killedPid: Long = -1L
    private val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    private val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    private val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (seen.incrementAndGet() >= minTasks &&
            fired.compareAndSet(false, true)) {
          val t = new Thread(() => {
            // retry briefly: a relaunch window can leave zero live
            // executor processes for a moment
            var tries = 0
            while (killedPid < 0 && tries < 50) {
              executorProcs().headOption match {
                case Some(p) =>
                  val pid = p.pid()
                  if (p.destroyForcibly()) killedPid = pid
                case None => Thread.sleep(100)
              }
              tries += 1
            }
          }, "graft-executor-killer")
          t.setDaemon(true)
          t.start()
        }
    }
    s.sparkContext.addSparkListener(listener)
    def finish(): Long = {
      s.sparkContext.removeSparkListener(listener)
      killedPid
    }
  }

  /** Runs `leg` with a kill armed at `minTasks`; asserts the kill actually
    * fired (the leg must be long enough) and returns the leg's result. */
  private def withKill[T](minTasks: Int)(leg: => T): T = {
    val k = new Killer(cluster, minTasks)
    try {
      val r = leg
      // the killer thread may still be selecting its victim when the leg
      // finishes recovering; give it a beat before asserting it fired
      var waited = 0
      while (k.killedPid < 0 && waited < 20) { Thread.sleep(100); waited += 1 }
      assert(k.killedPid > 0,
        s"executor kill never fired (leg too fast for minTasks=$minTasks)")
      r
    } finally k.finish()
  }

  // ------------------------------------------------------------- leg inputs
  private def synthRels(s: SparkSession): Set[String] = {
    import s.implicits._
    val geoms = SynthGeo.dataset(s, 120000L, 42L)
    SpatialJoin.run(s, geoms, s.emptyDataset[RefEdge])
      .select(col("a_id"), col("predicate"), col("b_id"))
      .collect().map(_.mkString("|")).toSet
  }

  private def ccEdges(s: SparkSession): DataFrame = {
    import s.implicits._
    val rnd = new scala.util.Random(13)
    (Seq.fill(4000)((rnd.nextInt(1500).toLong, rnd.nextInt(1500).toLong)) ++
      // a 3000-node chain: forces several star-contraction rounds, so the
      // kill lands MID-ROUNDS with carried state checkpointed
      (0L until 2999L).map(i => (50000L + i, 50001L + i))).toDF("a", "b")
  }

  private def ccLabels(s: SparkSession, dir: Option[String]): Set[String] =
    graft.ops.ConnectedComponents.run(ccEdges(s), checkpointDir = dir)
      .collect().map(_.mkString("|")).toSet

  private def knnPts(s: SparkSession): DataFrame =
    SynthGeo.dataset(s, 20000L, 11L).filter(_.kind == 0)
      .toDF().select(col("gid"), col("minX").as("x"), col("minY").as("y"))

  private def knnRows(s: SparkSession, dir: Option[String]): Set[String] =
    Knn.pointKnn(s, knnPts(s), hash(col("gid")) % 50 === 0, 3, dir)
      .collect().map(_.mkString("|")).toSet

  override def beforeAll(): Unit = {
    val home = Paths.get("target", "spark-home").toAbsolutePath
    Files.createDirectories(home)
    val jars = home.resolve("jars")
    if (!Files.exists(jars))
      Files.createSymbolicLink(jars, Paths.get("/opt/spark/jars"))
    Files.createDirectories(home.resolve("launcher/target/scala-2.13"))
    sys.props("spark.testing") = "true"
    sys.props("spark.test.home") = home.toString
    cluster = SparkSession.builder()
      .master("local-cluster[2,4,2048]")
      .appName("fault-tolerance")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.extraJavaOptions", addOpens)
      .getOrCreate()
    cluster.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    if (cluster != null) cluster.stop()
    sys.props.remove("spark.testing")
    sys.props.remove("spark.test.home")
    if (local != null) local.stop()
  }

  /** Local-mode expectation session: only ONE SparkContext may live per
    * JVM, so the cluster is stopped (all cluster legs must be done) before
    * the local session is created. */
  private def localSession(): SparkSession = {
    if (local == null) {
      if (cluster != null) { cluster.stop(); cluster = null }
      sys.props.remove("spark.testing")
      sys.props.remove("spark.test.home")
      local = SparkSession.builder()
        .master("local[8]")
        .appName("fault-tolerance-local")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      local.sparkContext.setLogLevel("ERROR")
    }
    local
  }

  // ------------------------------------------------------------------ legs
  // ScalaTest runs tests in declaration order: every cluster leg runs
  // first and stashes its post-kill result; the final test stops the
  // cluster, opens the local session, and compares (one SparkContext per
  // JVM, same sequencing as ClusterParitySpec).
  private var fusedAfterKill: Set[String] = _
  private var ccAfterKill: Set[String] = _
  private var knnAfterKill: Set[String] = _
  private var localCkptOutcome: Either[Throwable, Set[String]] = _
  private var execsSeen = 0

  test("cluster is up with >= 2 forked executor JVMs") {
    // force executor registration with a tiny job, then count processes
    cluster.range(100).count()
    execsSeen = executorProcs().size
    assert(execsSeen >= 2, s"expected >= 2 executor JVMs, saw $execsSeen")
  }

  test("fused join survives an executor SIGKILL mid-run (lineage recompute)") {
    fusedAfterKill = withKill(minTasks = 24) { synthRels(cluster) }
    assert(fusedAfterKill.nonEmpty)
  }

  test("CC with reliable checkpointDir survives a SIGKILL mid-rounds") {
    val dir = Files.createTempDirectory("graft-ft-cc").toString
    ccAfterKill = withKill(minTasks = 60) {
      ccLabels(cluster, Some(dir))
    }
    assert(ccAfterKill.nonEmpty)
  }

  test("kNN with reliable checkpointDir survives a SIGKILL mid-ring") {
    val dir = Files.createTempDirectory("graft-ft-knn").toString
    knnAfterKill = withKill(minTasks = 30) {
      knnRows(cluster, Some(dir))
    }
    assert(knnAfterKill.nonEmpty)
  }

  test("dedupStream state survives an executor SIGKILL (loss, not restart)") {
    // stronger than the restart contract (StreamRestartSpec /
    // ClusterPipelineSpec): the executor holding state-store partitions
    // dies WHILE the query keeps running — reassigned state partitions
    // must reload from the checkpoint's snapshot+delta files on the
    // surviving/replacement executor, with no query restart
    val s = cluster
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ckpt = Files.createTempDirectory("graft-ft-stream").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, java.sql.Timestamp, String)]
    val sdf = mem.toDF().toDF("url", "ts", "text")
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val q = graft.streaming.StreamOps.dedupStream(s, sdf)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach(r => got.add(r.getString(0)))
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    def t(x: String) = java.sql.Timestamp.valueOf(x)
    // batch 1 establishes suppression state for X and Y
    mem.addData(("u1", t("2024-01-01 12:00:00"), "X"),
      ("u2", t("2024-01-01 12:01:00"), "Y"))
    q.processAllAvailable()
    assert(got.contains("u1") && got.contains("u2"))
    // arm the killer: the very next tasks are batch 2's
    val k = new Killer(cluster, minTasks = 4)
    try {
      mem.addData(("u3", t("2024-01-01 12:30:00"), "X"), // dup -> suppress
        ("u4", t("2024-01-01 12:40:00"), "Z"))
      q.processAllAvailable()
      mem.addData(("u5", t("2024-01-01 12:50:00"), "W"))
      q.processAllAvailable()
    } finally q.stop()
    var waited = 0
    while (k.killedPid < 0 && waited < 20) { Thread.sleep(100); waited += 1 }
    val pid = k.finish()
    assert(pid > 0, "executor kill never fired")
    assert(!got.contains("u3"),
      "duplicate re-emitted: state lost with the killed executor")
    assert(got.contains("u4") && got.contains("u5"),
      s"post-kill batches incomplete: $got")
  }

  test("localCheckpoint mode under executor loss: fails or exact, never wrong") {
    // the DOCUMENTED failure mode: without checkpointDir the carried CC
    // state lives only in executor blocks with truncated lineage; a kill
    // mid-rounds may abort the job (acceptable: that is why the reliable
    // option exists) — what it must NEVER do is complete with wrong labels
    val k = new Killer(cluster, minTasks = 60)
    localCkptOutcome =
      try Right(ccLabels(cluster, None))
      catch { case t: Throwable => Left(t) }
    val pid = k.finish()
    assert(pid > 0 || localCkptOutcome.isRight,
      "kill never fired and the leg failed anyway")
    localCkptOutcome match {
      case Left(t) =>
        info(s"job failed as documented: ${t.getClass.getSimpleName}: " +
          t.getMessage.take(160))
      case Right(_) => () // survived (kill may have landed between rounds
        // or on blocks with a live replica path) — exactness checked below
    }
  }

  test("post-kill outputs byte-identical to a healthy local run") {
    // every cluster leg is done; now compute the independent expectations
    val s = localSession()
    assert(fusedAfterKill == synthRels(s),
      s"fused join diverged after kill: cluster=${fusedAfterKill.size}")
    assert(ccAfterKill == ccLabels(s, None),
      s"CC diverged after kill: cluster=${ccAfterKill.size}")
    assert(knnAfterKill == knnRows(s, None),
      s"kNN diverged after kill: cluster=${knnAfterKill.size}")
    localCkptOutcome match {
      case Right(labels) =>
        assert(labels == ccLabels(s, None),
          "localCheckpoint leg completed with WRONG labels after kill")
      case Left(_) => () // documented failure mode
    }
  }
}
