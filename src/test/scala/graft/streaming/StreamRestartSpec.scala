package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Crash-resume contract of the streaming dedup (VERDICT r3 "Next round
  * #3"): the MemoryStream suite proves the semantics within one run; this
  * spec stops the query mid-stream and RESTARTS it from
  * `checkpointLocation`, proving
  *
  *   1. suppression state survives the restart (a duplicate arriving
  *      after the restart is still suppressed),
  *   2. event-time TTL keeps working across the restart (a key whose
  *      state was written before the stop expires afterwards and
  *      re-emits).
  *
  * The sink is foreachBatch (the memory sink refuses checkpoint
  * recovery); emitted urls accumulate in a concurrent set, so an
  * at-least-once replay of the last batch cannot flake the assertions.
  */
class StreamRestartSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("stream-restart")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def t(s: String) = Timestamp.valueOf(s)

  test("dedupStream state + TTL survive a checkpoint restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-dedup-restart").toString
    val mem = MemoryStream[(String, Timestamp, String)]
    val sdf = mem.toDF().toDF("url", "ts", "text")
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def start() = StreamOps.dedupStream(s, sdf)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => got.add(r.getString(0)))
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

    // run 1 — X(u1) and Y(u2) are first sightings; Y's TTL anchor
    // (12:01 + 1h) is written to the state store before the stop
    val q1 = start()
    mem.addData(("u1", t("2024-01-01 12:00:00"), "X"),
      ("u2", t("2024-01-01 12:01:00"), "Y"))
    q1.processAllAvailable()
    q1.stop()
    assert(got.contains("u1") && got.contains("u2"))

    // run 2 — same checkpoint. The X duplicate MUST be suppressed by the
    // state recovered from run 1; Z advances the watermark to 13:15
    val q2 = start()
    mem.addData(("u3", t("2024-01-01 12:30:00"), "X"),
      ("u4", t("2024-01-01 13:45:00"), "Z"))
    q2.processAllAvailable()
    assert(!got.contains("u3"), "duplicate re-emitted: state lost on restart")
    assert(got.contains("u4"))

    // W pushes the watermark to 14:10 with NO data for Y, so Y's
    // pre-restart anchor (13:01) times out during this batch
    mem.addData(("u5", t("2024-01-01 14:40:00"), "W"))
    q2.processAllAvailable()
    // Y re-emits: its state was expired by the post-restart TTL machinery
    mem.addData(("u6", t("2024-01-01 14:20:00"), "Y"))
    q2.processAllAvailable()
    q2.stop()
    assert(got.contains("u5") && got.contains("u6"),
      s"TTL across restart broken: got=$got")
    assert(got == java.util.Set.of("u1", "u2", "u4", "u5", "u6"))
  }

  test("nearDupScreen candidate-dedup state survives a checkpoint restart") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir = Seq("sf0.001", "sf0.01").map(d => s"/root/testdata/$d")
      .find(d => new java.io.File(d + "/documents.parquet").exists())
    assume(dir.isDefined, "driver testdata not present")
    val corpusDoc = graft.Tables
      .parquet(s, dir.get + "/documents.parquet")
      .selectExpr("doc_id", "text").limit(1).collect().head
    val (cid, ctext) = (corpusDoc.getLong(0), corpusDoc.getString(1))

    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-neardup-restart").toString
    val mem = MemoryStream[(Long, Timestamp, String)]
    val sdf = mem.toDF().toDF("doc_id", "ts", "text")
    val screen = graft.ops.TextSim.corpusScreen(s, dir.get, persist = true)
    val emitted = java.util.concurrent.ConcurrentHashMap
      .newKeySet[(Long, Long)]()
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    def start() = graft.ops.TextSim.nearDupScreen(s, sdf, screen)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.incrementAndGet()
        df.collect().foreach(r => emitted.add((r.getLong(0), r.getLong(1))))
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

    // run 1: doc 9001 = verbatim corpus text -> one (9001, cid) pair
    val q1 = start()
    mem.addData((9001L, t("2024-01-01 12:00:00"), ctext))
    q1.processAllAvailable()
    q1.stop()
    assert(emitted.contains((9001L, cid)))

    // run 2, same checkpoint: the SAME pair again within the watermark —
    // dropDuplicatesWithinWatermark state must survive and suppress it
    val n1 = emitted.size
    val q2 = start()
    mem.addData((9001L, t("2024-01-01 12:05:00"), ctext))
    q2.processAllAvailable()
    q2.stop()
    assert(emitted.size == n1,
      s"pair re-emitted after restart: $emitted")
    screen.unpersist()
  }
}
