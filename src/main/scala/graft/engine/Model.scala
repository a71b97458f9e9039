package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.geom.{Geo, Wkt}

/** One sub-geometry row (multi-geometries and collections decomposed;
  * subId = 0 means "single geometry", like the reference's subId
  * discipline, reference: src/spatialjoin/Sweeper.cpp:71-159). */
final case class SubGeom(
    gid: String,
    side: Int,
    subId: Int,
    nSubs: Int,
    kind: Int, // 0 point, 1 line, 2 polygon
    coords: Array[Int],
    ringEnds: Array[Int],
    minX: Int, minY: Int, maxX: Int, maxY: Int)

/** One alias edge: `referer` takes over the relations computed for
  * (`target`, `targetSub`); subId/nSubs are the referer's slot discipline.
  * Authored `<...,target,...>` refs always point at target sub 0
  * (reference: src/spatialjoin/WKTParse.h:143-173, Sweeper.cpp:739-745);
  * the duplicate->reference rewrite (P9, Sweeper.cpp:1162-1309) adds
  * per-sub edges with targetSub = the keeper's sub id. */
final case class RefEdge(
    referer: String,
    side: Int,
    target: String,
    subId: Int,
    nSubs: Int,
    targetSub: Int = 0)

object Model {

  /** '<' as UTF8String for the byte-level refs line pre-filter. */
  private val REF_MARK = org.apache.spark.unsafe.types.UTF8String.fromString("<")

  def toG(kind: Int, coords: Array[Int], ringEnds: Array[Int]): Geo.G =
    new Geo.G(kind, coords, ringEnds)

  def subGeomsOf(row: Wkt.Row): Seq[SubGeom] = {
    val n = row.subs.length
    row.subs.zipWithIndex.toSeq.map { case (g, i) =>
      val subId = if (n == 1) 0 else i + 1
      SubGeom(row.gid, row.side, subId, n, g.kind, g.coords, g.ringEnds,
        g.minX, g.minY, g.maxX, g.maxY)
    }
  }

  def refEdgesOf(row: Wkt.Row): Seq[RefEdge] = {
    val n = row.refs.length
    row.refs.zipWithIndex.toSeq.map { case (t, i) =>
      RefEdge(row.gid, row.side, t, if (n == 1) 0 else i + 1, n)
    }
  }

  /** Parse a Dataset of raw fixture lines `id \t [side \t] WKT-or-<refs>`
    * into sub-geometries + alias edges. */
  /** `idOffset` shifts the default line-number ids (reference semantics
    * when several inputs are read sequentially into one id space: the
    * second file's line numbers continue after the first); authored ids
    * are never touched. `defaultSide` is the side for lines without an
    * explicit side field (the file index in two-file mode) — an authored
    * 3-field side always wins, as in the reference (WKTParse.h:139). */
  def parseLines(spark: SparkSession, lines: Dataset[String],
      idOffset: Long = 0L, defaultSide: Int = 0)
      : (Dataset[SubGeom], Dataset[RefEdge]) = {
    import spark.implicits._
    // zipWithIndex over the PHYSICAL rows, not Dataset.rdd: `.rdd` inserts
    // an InternalRow -> java.lang.String deserialization pass that the
    // offsets-count job (zipWithIndex's eager first job) and the refs line
    // filter below would pay on every line (guide §1.4 — ".rdd forces a
    // conversion ... adding cost the real query does not have"). The
    // physical iterator yields the same lines in the same partition order,
    // so the indices are unchanged; rows are consumed element-at-a-time
    // (flatMap/filter, no buffering), so the reused UnsafeRow is safe.
    val indexed = lines.queryExecution.toRdd.zipWithIndex()
    val rows = indexed.flatMap { case (r, i) =>
      Wkt.parseLine(r.getUTF8String(0).toString, i + 1 + idOffset, defaultSide)
    }
    val geoms = spark.createDataset(rows.flatMap(subGeomsOf))
    // Ref edges come ONLY from `<...>` payload lines (Wkt.parseLine:57 —
    // a WKT payload never contains '<'), and the geoms/refs Datasets are
    // materialized by separate consumers: deriving refs from `rows` made
    // every refs materialization re-run the FULL WKT parse of every
    // geometry line a second time (guide §1.2 — one of the three measured
    // parse passes per spatial query). The refs side now pre-filters to
    // '<'-bearing lines, so its pass is a string scan plus the (cheap) ref
    // parse; non-matching lines can't contribute edges, and matching lines
    // go through the identical parseLine, so the edge multiset is
    // unchanged for any input.
    val refRows = indexed
      .filter(_._1.getUTF8String(0).contains(REF_MARK))
      .flatMap { case (r, i) =>
        Wkt.parseLine(r.getUTF8String(0).toString, i + 1 + idOffset,
          defaultSide)
      }
    val refs = spark.createDataset(refRows.flatMap(refEdgesOf))
    (geoms, refs)
  }
}

/** The graft input table shape (BASELINE.json input_hint):
  * (url, warc_ts, html, text, lang). Geometries are embedded in `text`;
  * `url` carries the geometry id. Deterministic synthesis for tests and
  * benchmarks; the extractor must re-emit `text` byte-identically.
  */
object Pages {

  final val EPOCH = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  /** Build the pages table from raw fixture lines. The full fixture line is
    * the page `text` (so extraction = WKT parse of text); url embeds the id. */
  def fromFixtureLines(spark: SparkSession, dataset: String,
      lines: Seq[String]): DataFrame = {
    import spark.implicits._
    lines.zipWithIndex.toDF("text", "idx")
      .select(
        concat(lit(s"https://fixture.test/$dataset/"),
          encodeUrl(split(col("text"), "\t").getItem(0))).as("url"),
        expr("timestampadd(SECOND, idx, timestamp'2024-01-01 00:00:00')")
          .as("warc_ts"),
        concat(lit("<html><body>"), col("text"), lit("</body></html>"))
          .cast("binary").as("html"),
        col("text"),
        lit("en").as("lang"))
  }

  private def encodeUrl(c: org.apache.spark.sql.Column) =
    base64(c.cast("binary"))

  /** pages -> (geometries, refs). gid is recovered from the fixture line
    * embedded in `text` (id column inside text), NOT from the url, so ids
    * round-trip byte-identically. */
  def extract(spark: SparkSession, pages: DataFrame)
      : (Dataset[SubGeom], Dataset[RefEdge]) = {
    import spark.implicits._
    val lines = pages.select(col("text")).as[String]
    // line numbers are only the default-id fallback; fixture pages always
    // carry explicit ids, so zipWithIndex determinism is not relied upon.
    Model.parseLines(spark, lines)
  }
}
