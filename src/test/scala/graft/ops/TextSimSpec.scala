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

  test("bandsProjection rejects inputs with reserved column names") {
    val s = spark
    import s.implicits._
    val bad = Seq((1L, "a b c d", "x")).toDF("doc_id", "text", "band")
    val e = intercept[IllegalArgumentException] {
      TextSim.bandsProjection(bad)
    }
    assert(e.getMessage.contains("band"))
    // Spark resolves columns case-insensitively by default, so `Band`
    // collides exactly like `band` and must be rejected up front too
    val badCase = Seq((1L, "a b c d", "x")).toDF("doc_id", "text", "Band")
    val e2 = intercept[IllegalArgumentException] {
      TextSim.bandsProjection(badCase)
    }
    assert(e2.getMessage.contains("Band"))
  }

  test("write-once corpus screen index == inline screen (q26 batch plan)") {
    val dir = sfDir
    assume(dir.isDefined, "driver testdata not present")
    val out = java.nio.file.Files
      .createTempDirectory("graft-corpus-screen").toString
    TextSim.writeCorpusScreen(spark, dir.get, out)
    val idx = TextSim.readCorpusScreen(spark, out)
    val probe = graft.Tables.parquet(spark, dir.get + "/documents.parquet")
      .filter(col("doc_id") % 50 === 0)
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaIndex = key(TextSim.nearDupScreen(spark, probe, idx))
    val inline = key(TextSim.nearDupCorpusBatch(spark, dir.get))
    assert(viaIndex.nonEmpty && viaIndex == inline)
  }

  test("q27 packing invariant: no bin over 256 tokens unless singleton; " +
      "bins contiguous per class") {
    val dir = sfDir
    assume(dir.isDefined, "driver testdata not present")
    val rows = graft.queries.QueryPack.q27SeqPack(spark, dir.get)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    val byBin = rows.groupBy(r => (r._2, r._3))
    byBin.foreach { case ((cls, bin), docs) =>
      val tot = docs.map(_._4).sum
      assert(tot <= 256 || docs.length == 1,
        s"cls=$cls bin=$bin tokens=$tot docs=${docs.length}")
    }
    // bins are dense 0..max per class, and doc_id order is monotone
    // across bin order within a class
    rows.groupBy(_._2).foreach { case (cls, ds) =>
      val bins = ds.map(_._3).distinct.sorted
      assert(bins.head == 0L && bins.last == bins.length - 1,
        s"cls=$cls bins not dense: ${bins.take(5).mkString(",")}")
      val sorted = ds.sortBy(_._1)
      assert(sorted.map(_._3).sliding(2).forall(p =>
        p.length < 2 || p(0) <= p(1)), s"cls=$cls bin order not monotone")
    }
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
