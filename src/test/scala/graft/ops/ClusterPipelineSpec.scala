package graft.ops

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Multi-executor proof for the LLM-pipeline surface (VERDICT r4 "Next
  * round #2 and #8").
  *
  * ClusterParitySpec covers fixtures/SynthGeo/kNN/CC; the stateful
  * streaming and LSH shuffles had never run with more than one executor
  * JVM — exactly where closure/state-store surprises live (the r4
  * `UTF8String.compareTo` find proved the class of bug is real). Under
  * `local-cluster[2,4,2048]` with two forked executor JVMs this spec runs:
  *
  *   - q17_minhash_lsh / q25_dedup_cc / q26_neardup_corpus on the sf0.01
  *     testdata, byte-identical to local mode;
  *   - the dedupStream checkpoint RESTART contract (suppression state +
  *     event-time TTL recovered from executor-written state stores);
  *   - nearDupScreen against the WRITE-ONCE CorpusScreen parquet index
  *     with a mid-stream restart: candidate-dedup state survives, and the
  *     streamed output equals the batch face of the same rows.
  */
class ClusterPipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val pipelineQueries = Seq("q17_minhash_lsh", "q25_dedup_cc",
    "q26_neardup_corpus")

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")

  private val sfDir = Seq("sf0.01", "sf0.001").map(d => s"/root/testdata/$d")
    .find(d => new java.io.File(d + "/documents.parquet").exists())

  private def rowSet(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  private def t(s: String) = Timestamp.valueOf(s)

  // ---- cluster-phase results --------------------------------------------
  private var cQueries: Map[String, Set[String]] = Map.empty
  private var cExecs = 0
  private var dedupEmitted: Set[String] = _
  private var dedupRestartOk: Option[String] = _ // None = ok, Some = failure
  private var screenEmitted: Set[(Long, Long)] = _
  private var screenBatchFace: Set[(Long, Long)] = _
  private var screenRestartOk: Option[String] = _

  private var spark: SparkSession = _ // local compare side

  /** dedupStream restart contract, verbatim from StreamRestartSpec but on
    * the given (cluster) session. Returns None if every assertion held. */
  private def dedupRestartLeg(s: SparkSession): (Set[String], Option[String]) = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ckpt = Files.createTempDirectory("graft-cluster-dedup").toString
    val mem = MemoryStream[(String, Timestamp, String)]
    val sdf = mem.toDF().toDF("url", "ts", "text")
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def start() = graft.streaming.StreamOps.dedupStream(s, sdf)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach(r => got.add(r.getString(0)))
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    val q1 = start()
    mem.addData(("u1", t("2024-01-01 12:00:00"), "X"),
      ("u2", t("2024-01-01 12:01:00"), "Y"))
    q1.processAllAvailable()
    q1.stop()
    val q2 = start()
    mem.addData(("u3", t("2024-01-01 12:30:00"), "X"),
      ("u4", t("2024-01-01 13:45:00"), "Z"))
    q2.processAllAvailable()
    mem.addData(("u5", t("2024-01-01 14:40:00"), "W"))
    q2.processAllAvailable()
    mem.addData(("u6", t("2024-01-01 14:20:00"), "Y"))
    q2.processAllAvailable()
    q2.stop()
    import scala.jdk.CollectionConverters._
    val res = got.asScala.toSet
    val want = Set("u1", "u2", "u4", "u5", "u6")
    (res, if (res == want) None
      else Some(s"emitted $res, expected $want (u3 suppressed, u6 TTL re-emit)"))
  }

  /** nearDupScreen vs the WRITE-ONCE parquet index, with a mid-stream
    * restart, all in-cluster. */
  private def screenRestartLeg(s: SparkSession, dir: String)
      : (Set[(Long, Long)], Set[(Long, Long)], Option[String]) = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val rows = graft.Tables.parquet(s, dir + "/documents.parquet")
      .selectExpr("doc_id", "text").orderBy("doc_id").limit(2).collect()
    val (idA, textA) = (rows(0).getLong(0), rows(0).getString(1))
    val (idB, textB) = (rows(1).getLong(0), rows(1).getString(1))
    val out = Files.createTempDirectory("graft-cluster-screen").toString
    TextSim.writeCorpusScreen(s, dir, out)
    val screen = TextSim.readCorpusScreen(s, out)

    val ckpt = Files.createTempDirectory("graft-cluster-screen-ck").toString
    val mem = MemoryStream[(Long, Timestamp, String)]
    val sdf = mem.toDF().toDF("doc_id", "ts", "text")
    val emitted = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(Long, Long)]()
    // total rows across batches: re-emission of a suppressed pair would
    // be invisible in the SET, so count every emitted row as well.
    // foreachBatch replays the last batch at-least-once on restart, so
    // the count uses per-batch-id dedup (max one contribution per batch)
    val perBatch = new java.util.concurrent.ConcurrentHashMap[Long, Int]()
    def start() = TextSim.nearDupScreen(s, sdf, screen)
      .writeStream
      .foreachBatch { (df: DataFrame, bid: Long) =>
        val rows = df.collect()
        rows.foreach(r => emitted.add((r.getLong(0), r.getLong(1))))
        perBatch.put(bid, rows.length)
        ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

    // run 1: doc 9001 = verbatim corpus text A -> finds (9001, idA)
    val q1 = start()
    mem.addData((9001L, t("2024-01-01 12:00:00"), textA))
    q1.processAllAvailable()
    q1.stop()
    // run 2, same checkpoint: the SAME pair again (state must suppress it)
    // plus doc 9002 = corpus text B (new match found after restart)
    val q2 = start()
    mem.addData((9001L, t("2024-01-01 12:05:00"), textA),
      (9002L, t("2024-01-01 12:06:00"), textB))
    q2.processAllAvailable()
    q2.stop()

    import scala.jdk.CollectionConverters._
    val streamed = emitted.asScala.toSet
    val totalRows = perBatch.values().asScala.sum
    // batch face on the identical rows (dedup degrades to dropDuplicates)
    val batchDf = Seq((9001L, t("2024-01-01 12:00:00"), textA),
      (9002L, t("2024-01-01 12:06:00"), textB))
      .toDF("doc_id", "ts", "text")
    val batch = TextSim.nearDupScreen(s, batchDf, screen)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val err =
      if (!streamed.contains((9001L, idA)))
        Some(s"run-1 match missing: $streamed")
      else if (!streamed.contains((9002L, idB)))
        Some(s"post-restart match missing: $streamed")
      else if (totalRows != streamed.size)
        Some(s"$totalRows rows emitted for ${streamed.size} distinct pairs" +
          " — candidate-dedup state lost on restart (pair re-emitted)")
      else None
    (streamed, batch, err)
  }

  override def beforeAll(): Unit = {
    assume(sfDir.isDefined, "driver testdata not present")
    val home = Paths.get("target", "spark-home").toAbsolutePath
    Files.createDirectories(home)
    val jars = home.resolve("jars")
    if (!Files.exists(jars))
      Files.createSymbolicLink(jars, Paths.get("/opt/spark/jars"))
    Files.createDirectories(home.resolve("launcher/target/scala-2.13"))
    sys.props("spark.testing") = "true"
    sys.props("spark.test.home") = home.toString
    val cluster = SparkSession.builder()
      .master("local-cluster[2,4,2048]")
      .appName("cluster-pipeline")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.extraJavaOptions", addOpens)
      .getOrCreate()
    cluster.sparkContext.setLogLevel("ERROR")
    try {
      cQueries = pipelineQueries.map { q =>
        val r = rowSet(graft.SparkEntry.queries(q)(cluster, sfDir.get))
        cluster.catalog.clearCache()
        q -> r
      }.toMap
      cExecs = cluster.sparkContext.statusTracker.getExecutorInfos
        .count(_.host() != null) - 1
      val (de, derr) = dedupRestartLeg(cluster)
      dedupEmitted = de; dedupRestartOk = derr
      val (se, sb, serr) = screenRestartLeg(cluster, sfDir.get)
      screenEmitted = se; screenBatchFace = sb; screenRestartOk = serr
    } finally {
      cluster.stop()
      sys.props.remove("spark.testing")
      sys.props.remove("spark.test.home")
    }
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("cluster-pipeline-local")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("cluster phase ran on >= 2 forked executor JVMs") {
    assume(sfDir.isDefined, "driver testdata not present")
    assert(cExecs >= 2, s"expected >= 2 executors, saw $cExecs")
  }

  for (q <- pipelineQueries)
    test(s"$q byte-identical: local-cluster vs local") {
      assume(sfDir.isDefined, "driver testdata not present")
      val local = rowSet(graft.SparkEntry.queries(q)(spark, sfDir.get))
      spark.catalog.clearCache()
      val c = cQueries(q)
      assert(c.nonEmpty, "cluster produced no rows")
      assert(c == local, s"cluster=${c.size} local=${local.size} " +
        s"diff=${(c diff local).take(3)} ${(local diff c).take(3)}")
    }

  test("dedupStream state + TTL survive a checkpoint restart IN-CLUSTER") {
    assume(sfDir.isDefined, "driver testdata not present")
    assert(dedupRestartOk.isEmpty, dedupRestartOk.getOrElse(""))
  }

  test("nearDupScreen vs write-once index: restart-safe and == batch face") {
    assume(sfDir.isDefined, "driver testdata not present")
    assert(screenRestartOk.isEmpty, screenRestartOk.getOrElse(""))
    assert(screenEmitted == screenBatchFace,
      s"stream=$screenEmitted batch=$screenBatchFace")
  }
}
