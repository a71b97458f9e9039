package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The stateless bands projection vs the batch groupBy minhash path, and
  * the stream-vs-corpus near-dup screen. */
class TextSimSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("textsim")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sfDir: Option[String] =
    Seq("sf0.001", "sf0.01").map(s => s"/root/testdata/$s")
      .find(d => new java.io.File(d + "/documents.parquet").exists())

  test("bandsProjection == minhashBands (projection vs groupBy minhash)") {
    val dir = sfDir
    assume(dir.isDefined, "driver testdata not present")
    val docs = graft.Tables.parquet(spark, dir.get + "/documents.parquet")
    val proj = TextSim.bandsProjection(docs)
      .select(col("doc_id"), col("band"), col("bv")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val agg = TextSim.minhashBands(spark, dir.get)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(proj == agg)
    assert(proj.nonEmpty)
  }

  test("nearDupStream: stream near-copy finds its corpus doc; " +
      "stream == batch") {
    val dir = sfDir
    assume(dir.isDefined, "driver testdata not present")
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // a corpus doc with enough text, and a near-copy of it (last word cut)
    val src = graft.Tables.parquet(spark, dir.get + "/documents.parquet")
      .filter(size(split(col("text"), " ")) >= 12)
      .select(col("doc_id"), col("text")).head()
    val srcId = src.getLong(0)
    val near = src.getString(1).split(" ").dropRight(1).mkString(" ")
    def t(x: String) = java.sql.Timestamp.valueOf(x)
    val rows = Seq(
      (900001L, t("2024-01-01 10:00:00"), near),
      (900002L, t("2024-01-01 10:00:01"),
        "zq xv qj zq xv qj zq xv qj zq xv qj")) // junk: matches nothing
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val sdf = mem.toDF().toDF("doc_id", "ts", "text")
    val q = TextSim.nearDupStream(s, sdf, dir.get)
      .writeStream.format("memory").queryName("nds")
      .outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("nds").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    // the near-copy pairs with its source at high jaccard; junk pairs none
    assert(streamed.exists { case (d, c, j) =>
      d == 900001L && c == srcId && j >= 0.5 })
    assert(!streamed.exists(_._1 == 900002L))
    // batch parity: the same function over the same rows as a batch DF
    val batch = TextSim
      .nearDupStream(s, rows.toDF("doc_id", "ts", "text"), dir.get)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
  }
}
