package graft.sql

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.engine.{Model, SpatialConfig, SpatialJoin}

/** The `st_*` SQL function surface.
  *
  * The heavyweight checks are DIFFERENTIAL: every fixture pair is related
  * twice — once through the distributed join engine (cell cover + fused
  * kernel + aggregation) and once through the scalar SQL functions
  * (per-pair RelAgg fold) — and the two relation sets must be identical.
  * The two paths share the geometry kernels but compose them through
  * completely different aggregation machinery, so agreement pins both.
  *
  * CODEGEN_ONLY factory mode makes any codegen fallback a hard failure:
  * the session proves the expressions generate compilable code.
  */
class SqlFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("sqlfuns")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def sql1(q: String): Any = spark.sql(q).head().get(0)

  // ------------------------------------------------------------ truth table

  test("predicate truth table on hand geometries") {
    val box = "'POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))'"
    val holed = "'POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))'"
    assert(sql1(s"SELECT st_intersects('POINT(5 5)', $box)") == true)
    assert(sql1(s"SELECT st_contains($box, 'POINT(5 5)')") == true)
    assert(sql1(s"SELECT st_covers($box, 'POINT(5 5)')") == true)
    // boundary point: covered but not contained
    assert(sql1(s"SELECT st_covers($box, 'POINT(0 5)')") == true)
    assert(sql1(s"SELECT st_contains($box, 'POINT(0 5)')") == false)
    assert(sql1(s"SELECT st_touches($box, 'POINT(0 5)')") == true)
    // hole interior is outside
    assert(sql1(s"SELECT st_intersects('POINT(5 5)', $holed)") == false)
    assert(sql1(s"SELECT st_crosses('LINESTRING(-1 5, 11 5)', $box)") == true)
    assert(sql1(s"SELECT st_crosses('LINESTRING(0 0, 10 10)', " +
      "'LINESTRING(0 10, 10 0)')") == true)
    assert(sql1(s"SELECT st_overlaps($box, " +
      "'POLYGON((5 5, 15 5, 15 15, 5 15, 5 5))')") == true)
    assert(sql1(s"SELECT st_equals($box, " +
      "'MULTIPOLYGON(((0 0, 10 0, 10 10, 0 10, 0 0)))')") == true)
    assert(sql1(s"SELECT st_touches($box, " +
      "'POLYGON((10 0, 20 0, 20 10, 10 10, 10 0))')") == true)
    assert(sql1(s"SELECT st_intersects($box, " +
      "'POLYGON((20 20, 21 20, 21 21, 20 21, 20 20))')") == false)
    // de9im: interior/interior + equality diagnostics
    assert(sql1(s"SELECT st_relate($box, $box)") == "2FFF1FFF2")
    // null + invalid handling
    assert(spark.sql(s"SELECT st_intersects(NULL, $box)").head().isNullAt(0))
    assert(sql1(s"SELECT st_intersects('garbage', $box)") == false)
    assert(spark.sql("SELECT st_relate('garbage', 'POINT(0 0)')")
      .head().isNullAt(0))
  }

  test("measures and projection") {
    assert(sql1("SELECT st_merc_x(0.0D)") == 0)
    assert(sql1("SELECT st_merc_y(0.0D)") == 0)
    assert(sql1("SELECT st_merc_x(90.0D)") == 100187541)
    val a = sql1(
      "SELECT st_area('POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))')")
      .asInstanceOf[Double]
    // mercator stretches latitude: the 10°x10° box is sideX x sideY
    val side = graft.geom.Geo.projX(10.0) / graft.geom.Geo.PREC
    val sideY = graft.geom.Geo.projY(10.0) / graft.geom.Geo.PREC
    assert(math.abs(a - side * sideY) / (side * sideY) < 1e-6)
    val l = sql1("SELECT st_length('LINESTRING(0 0, 10 0)')")
      .asInstanceOf[Double]
    assert(math.abs(l - side) / side < 1e-6)
    assert(sql1("SELECT st_distance('POINT(0 0)', 'POINT(0 0)')") == 0.0)
    assert(sql1("SELECT st_area('garbage')").asInstanceOf[Double].isNaN)
  }

  // --------------------------------------------------- fixture differential

  private def fixtureWkts(name: String): Seq[(String, String)] = {
    val in = getClass.getResourceAsStream(s"/datasets/$name")
    require(in != null, s"missing fixture $name")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().toList.flatMap { line =>
      val t = line.indexOf('\t')
      if (t < 0 || line.substring(t + 1).startsWith("<")) None
      else Some((line.substring(0, t), line.substring(t + 1)))
    } finally src.close()
  }

  /** All ordered pairs (a != b) of the fixture as a DataFrame. */
  private def orderedPairs(name: String): DataFrame = {
    val rows = fixtureWkts(name)
    val df = spark.createDataFrame(rows).toDF("gid", "wkt")
    val a = df.select(col("gid").as("a_id"), col("wkt").as("a_wkt"))
    val b = df.select(col("gid").as("b_id"), col("wkt").as("b_wkt"))
    a.crossJoin(b).filter(col("a_id") =!= col("b_id"))
  }

  private def engineRun(name: String, cfg: SpatialConfig): DataFrame = {
    val in = getClass.getResourceAsStream(s"/datasets/$name")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val lines = try src.getLines().toList finally src.close()
    val ds = spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING)
    val (geoms, refs) = Model.parseLines(spark, ds)
    SpatialJoin.run(spark, geoms, refs, cfg)
  }

  test("brute-force SQL predicates == engine join (example fixture)") {
    val preds = Seq("intersects", "equals", "covers", "contains", "touches",
      "crosses", "overlaps")
    val bruteRel = orderedPairs("example_id.txt").select(
      col("a_id"), col("b_id"),
      array(preds.map(p =>
        when(expr(s"st_$p(a_wkt, b_wkt)"), lit(p))): _*).as("ps"))
      .select(col("a_id"), explode(col("ps")).as("predicate"), col("b_id"))
      .filter(col("predicate").isNotNull)
    val brute = bruteRel.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val engine = engineRun("example_id.txt", SpatialConfig()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(brute == engine)
  }

  test("brute-force st_relate == engine de9im mode (example fixture)") {
    val brute = orderedPairs("example_id.txt")
      .filter(expr("st_intersects(a_wkt, b_wkt)"))
      .select(col("a_id"), expr("st_relate(a_wkt, b_wkt)").as("de9im"),
        col("b_id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet
    val engine = engineRun("example_id.txt", SpatialConfig(mode = "de9im"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .filter(t => t._1 != t._3)
      .toSet
    assert(brute == engine)
  }

  test("brute-force st_distance == engine distance mode (example fixture)") {
    val wd = 300000.0 // 300 km catches several example pairs
    val brute = orderedPairs("example_id.txt")
      .select(col("a_id"), expr("st_distance(a_wkt, b_wkt)").as("dist"),
        col("b_id"))
      .filter(col("dist") <= wd)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
      .toSet
    val engine = engineRun("example_id.txt",
      SpatialConfig(mode = "distance", withinDist = wd)).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    assert(brute.nonEmpty)
    assert(brute == engine)
  }

  // ------------------------------------------------------------- mechanics

  test("foldable literal fast path matches the generic path") {
    val poly = "POLYGON((-90 -40, 90 -40, 90 40, -90 40, -90 -40))"
    val pts = spark.range(1, 2000).select(
      concat(lit("POINT("),
        ((col("id") * 7919) % 360 - 180).cast("string"), lit(" "),
        ((col("id") * 104729) % 160 - 80).cast("string"), lit(")")).as("wkt"))
    val lit0 = pts.filter(expr(s"st_intersects(wkt, '$poly')")).count()
    val gen = pts.withColumn("p", lit(poly))
      .filter(expr("st_intersects(wkt, p)")).count()
    assert(lit0 == gen)
    assert(lit0 > 0 && lit0 < 1999)
  }

  test("runtime registration into a fresh session") {
    // newSession inherits the injected extensions; drop one function to
    // prove register() restores it (and is idempotent)
    val s2 = spark.newSession()
    s2.sessionState.functionRegistry.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("st_intersects"))
    intercept[Exception] {
      s2.sql("SELECT st_intersects('POINT(0 0)', 'POINT(0 0)')").collect()
    }
    GraftFunctions.register(s2)
    GraftFunctions.register(s2) // idempotent
    assert(s2.sql("SELECT st_intersects('POINT(0 0)', 'POINT(0 0)')")
      .head().getBoolean(0))
  }

  test("arity and type errors are analysis-time") {
    intercept[Exception] { spark.sql("SELECT st_intersects('POINT(0 0)')") }
    intercept[Exception] { spark.sql("SELECT st_area(1)").collect() }
  }
}
