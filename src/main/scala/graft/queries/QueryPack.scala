package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Oracle-checkable query pack over the driver's parquet tables.
  *
  * Every query here has a DuckDB-SQL twin in [[QueryPack.oracles]] producing
  * identical rows (same column names, deterministic values). Numeric rules:
  *   - money sums go through decimal so they are exact and order-independent,
  *     then cast back to double and rounded;
  *   - synthetic point coordinates are pure integer arithmetic (no FP).
  *
  * The synthetic-point queries (tile / within-distance / kNN) are the
  * SQL-expressible shadow of the spatial engine (see graft.engine): tile
  * assignment = raster<->vector cell cover of a point; the distance join and
  * kNN mirror the reference's within-distance mode (reference:
  * src/spatialjoin/Sweeper.cpp:4015-4277) on point geometries.
  */
object QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.parquet(s, s"$dir/$name.parquet")

  /** Exact decimal sum of a double column, emitted as double. All rounding
    * happens in the decimal domain (HALF_UP == DuckDB's half-away-from-zero
    * for the positive money values here); rounding the binary double instead
    * tips .xx5 sums differently between engines. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("decimal(18,2)").cast("double")

  /** Decimal-domain rounding of a (38,8) product sum to 2 decimals. */
  private def dsum8(c: Column): Column =
    sum(c.cast("decimal(38,8)")).cast("decimal(18,2)").cast("double")

  /** price * (1 - discount) in exact decimal. */
  private def discPrice: Column =
    (col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))

  // ---------------------------------------------------------------- tpch-ish

  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum8(discPrice).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .select("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "count_order")

  def q3Join(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    // dimension side is small at every SF relative to lineitem: broadcast it
    li.join(broadcast(ord.join(broadcast(cust),
        col("o_custkey") === col("c_custkey"))),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"))
      .agg(dsum8(discPrice).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  def q5Regional(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))

  def q7Window(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rk", rank().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
  }

  def q8Sessions(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))

  // --------------------------------------------------------------- text ops

  def q9DedupExact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))
      .filter(col("n_dups") >= 1)

  /** Quality metrics via pure replace/length arithmetic (portable). */
  def q10DocStats(s: SparkSession, dir: String): DataFrame = {
    val txt = col("text")
    val spaces = length(txt) - length(regexp_replace(txt, " ", ""))
    t(s, dir, "documents").select(
      col("doc_id"),
      length(txt).as("len_chars"),
      spaces.as("n_spaces"),
      (spaces + 1).as("n_tokens_ws"),
      // BPE-ish regex token count: letter runs, digit runs, single
      // non-alnum marks — the common pre-tokenization shape (portable
      // subset identical under Java regex and DuckDB's RE2)
      size(regexp_extract_all(txt, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))
        .cast("long").as("n_tokens_re"),
      ((length(txt) - length(regexp_replace(txt, "the", ""))) / 3)
        .cast("long").as("n_the"))
  }

  /** Language-ID heuristic via stopword occurrence counts. */
  def q11LangId(s: SparkSession, dir: String): DataFrame = {
    val padded = concat(lit(" "), col("text"), lit(" "))
    def cnt(w: String): Column =
      ((length(padded) - length(regexp_replace(padded,
        java.util.regex.Pattern.quote(s" $w "), ""))) / (w.length + 2))
        .cast("long")
    val en = (cnt("the") + cnt("and") + cnt("of")).as("sc_en")
    val de = (cnt("der") + cnt("die") + cnt("und")).as("sc_de")
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), en, de)
      .withColumn("guess",
        when(col("sc_en") > col("sc_de"), "en")
          .when(col("sc_de") > col("sc_en"), "de")
          .otherwise("other"))
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercased text. */
  def q12Fingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      md5(regexp_replace(lower(col("text")), "\\s+", " ").cast("binary"))
        .as("fp"))

  // ------------------------------------------------------------- embeddings

  /** Exact L2 norm + dot with a fixed deterministic probe vector. */
  def q13EmbedNorm(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").select(
      col("vec_id"), col("label"),
      round(sqrt(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))), 4)
        .as("l2norm"),
      size(col("embedding")).as("dim"))

  // ------------------------------------------------- synthetic point spatial
  //
  // Deterministic integer points derived from the orders table:
  //   x = (o_orderkey * 7919) % 20001 - 10000
  //   y = (o_orderkey * 104729) % 20001 - 10000
  // Pure integer arithmetic -> bit-identical in Spark and DuckDB.

  private def pts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      col("o_orderkey").as("pid"),
      ((col("o_orderkey") * 7919) % 20001 - 10000).as("x"),
      ((col("o_orderkey") * 104729) % 20001 - 10000).as("y"))

  /** Raster<->vector tile assignment: point -> 500x500 grid cell.
    * This is the SQL shadow of graft.engine tile assignment (reference
    * boxIds cover: src/spatialjoin/BoxIds.h:99-162). */
  def q14TileAssign(s: SparkSession, dir: String): DataFrame =
    pts(s, dir)
      .select(col("pid"), floor((col("x") + 10000) / 500).as("tx"),
        floor((col("y") + 10000) / 500).as("ty"))
      .groupBy(col("tx"), col("ty"))
      .agg(count(lit(1)).as("n_points"), min(col("pid")).as("min_pid"))

  /** Within-distance self-join (d=300) via grid-cell candidate join, exact
    * integer distance refinement. Mirrors reference --within-distance mode
    * (src/spatialjoin/Sweeper.h:350-388) at point granularity. */
  def q15DistJoin(s: SparkSession, dir: String): DataFrame = {
    val d = 300L
    val cell = 300L
    val p = pts(s, dir)
    val a = p.select(col("pid").as("a_pid"), col("x").as("ax"), col("y").as("ay"),
      floor(col("x") / cell).as("cx"), floor(col("y") / cell).as("cy"))
    // HALF 3x3 neighborhood (guide §2.3 — shuffle/test fewer candidate
    // rows): the r5 shape exploded the probe side into all 9 neighbor
    // cells, so every unordered cross-cell pair was joined twice and the
    // pid filter threw one copy away. The offset set {identity, E, NE, N,
    // NW} is antisymmetric over the 8-neighborhood (exactly one of
    // delta/-delta is in it), so each cross-cell pair is generated ONCE
    // (in whichever orientation), and same-cell pairs keep the pid-order
    // dedup. Output rows are canonicalized with least/greatest — dist2 is
    // symmetric, so the row set is unchanged (same DuckDB twin).
    val off = Seq((0L, 0L), (1L, 0L), (1L, 1L), (0L, 1L), (-1L, 1L))
    val b = p.select(col("pid").as("b_pid"), col("x").as("bx"), col("y").as("by"))
      .withColumn("o", explode(array(off.map { case (ox, oy) =>
        struct(lit(ox).as("ox"), lit(oy).as("oy")) }: _*)))
      .withColumn("cx", floor(col("bx") / cell) + col("o.ox"))
      .withColumn("cy", floor(col("by") / cell) + col("o.oy"))
      .withColumn("same", col("o.ox") === 0 && col("o.oy") === 0)
      .drop("o")
    a.join(b, Seq("cx", "cy"))
      .filter(!col("same") || col("a_pid") < col("b_pid"))
      .filter((col("ax") - col("bx")) * (col("ax") - col("bx")) +
        (col("ay") - col("by")) * (col("ay") - col("by")) <= d * d)
      .select(least(col("a_pid"), col("b_pid")).as("a_pid"),
        greatest(col("a_pid"), col("b_pid")).as("b_pid"),
        ((col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by"))).as("dist2"))
  }

  /** Exact kNN (k=3) for a 0.1% query sample via the engine's expanding
    * cell-ring search (graft.engine.Knn) — no crossJoin, no broadcast of
    * the data side; identical results to the brute-force oracle. */
  def q16Knn(s: SparkSession, dir: String): DataFrame =
    graft.engine.Knn.pointKnn(s,
      pts(s, dir).select(col("pid").as("gid"), col("x"), col("y")),
      col("gid") % 1000 === 0, 3)
      .select(col("q_gid").cast("long").as("q_pid"),
        col("gid").cast("long").as("pid"), col("dist2"), col("rk"))

  /** Sequence packing for training batches: documents fill fixed
    * 256-token bins greedily in doc_id order WITHIN a deterministic
    * stream class (doc_id % 8 — the distributed packing unit; each class
    * packs independently, so the layout is reproducible at ANY
    * parallelism, unlike range-partitioned packing whose boundaries come
    * from sampling). 8 classes here for the oracle's sake; at cluster
    * scale the class count is the parallelism knob (one sorted run per
    * class, any number of classes per task). Same constant-memory
    * repartition +
    * sortWithinPartitions + linear-scan shape as StreamOps.sessionize —
    * no per-class buffer ever materializes, a hot class is one sorted
    * run. A doc longer than the cap gets its own bin; tokens are the q10
    * whitespace rule. Emits (doc_id, cls, bin, tok). */
  def q27SeqPack(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cap = 256L
    val txt = col("text")
    // defensive null/sign rules, mirrored EXACTLY in the oracle SQL: null
    // text packs as 0 tokens (a null tok would crash the primitive-tuple
    // encoder below), rows without a doc_id are unpackable (the greedy
    // order is keyed on it) and are dropped, and cls uses pmod semantics
    // on both sides so negative ids agree
    t(s, dir, "documents")
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id").cast("long"),
        pmod(col("doc_id"), lit(8)).cast("long").as("cls"),
        coalesce((length(txt) - length(regexp_replace(txt, " ", "")) + 1)
          .cast("long"), lit(0L)).as("tok"))
      .repartition(col("cls"))
      .sortWithinPartitions(col("cls"), col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var curCls = Long.MinValue
        var bin = 0L
        var fill = 0L
        it.map { case (id, cls, tok) =>
          if (cls != curCls) { curCls = cls; bin = 0L; fill = tok }
          else if (fill + tok > cap) { bin += 1; fill = tok }
          else fill += tok
          (id, cls, bin, tok)
        }
      }
      .toDF("doc_id", "cls", "bin", "tok")
  }

  // ------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> q1Agg _,
    "q3_join" -> q3Join _,
    "q5_regional" -> q5Regional _,
    "q7_window" -> q7Window _,
    "q8_sessions" -> q8Sessions _,
    "q9_dedup_exact" -> q9DedupExact _,
    "q10_docstats" -> q10DocStats _,
    "q11_langid" -> q11LangId _,
    "q12_fingerprint" -> q12Fingerprint _,
    "q13_embed_norm" -> q13EmbedNorm _,
    "q14_tile_assign" -> q14TileAssign _,
    "q15_dist_join" -> q15DistJoin _,
    "q16_knn" -> q16Knn _,
    "q27_seq_pack" -> q27SeqPack _
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
        | CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,8))), 2) AS DOUBLE) AS sum_disc_price,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join" ->
      """SELECT l_orderkey,
        | CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,8))), 2) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey""".stripMargin,
    "q5_regional" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q7_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        | FROM orders) WHERE rk <= 3""".stripMargin,
    "q8_sessions" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        | count(*) AS n_events,
        | CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value,
        | count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q9_dedup_exact" ->
      """SELECT md5(text) AS text_hash, count(*) AS n_dups, min(doc_id) AS keep_id
        |FROM documents GROUP BY 1 HAVING count(*) >= 1""".stripMargin,
    "q10_docstats" ->
      """SELECT doc_id, length(text) AS len_chars,
        | length(text) - length(replace(text, ' ', '')) AS n_spaces,
        | length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens_ws,
        | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
        |   AS n_tokens_re,
        | (length(text) - length(replace(text, 'the', ''))) // 3 AS n_the
        |FROM documents""".stripMargin,
    "q11_langid" ->
      """WITH p AS (SELECT doc_id, lang, ' ' || text || ' ' AS pt FROM documents),
        |s AS (SELECT doc_id, lang,
        |  (length(pt) - length(replace(pt, ' the ', '')))//5
        |   + (length(pt) - length(replace(pt, ' and ', '')))//5
        |   + (length(pt) - length(replace(pt, ' of ', '')))//4 AS sc_en,
        |  (length(pt) - length(replace(pt, ' der ', '')))//5
        |   + (length(pt) - length(replace(pt, ' die ', '')))//5
        |   + (length(pt) - length(replace(pt, ' und ', '')))//5 AS sc_de
        | FROM p)
        |SELECT doc_id, lang, sc_en, sc_de,
        | CASE WHEN sc_en > sc_de THEN 'en' WHEN sc_de > sc_en THEN 'de'
        |      ELSE 'other' END AS guess
        |FROM s""".stripMargin,
    "q12_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin,
    "q13_embed_norm" ->
      """SELECT vec_id, label,
        | round(sqrt(list_sum(list_transform(embedding,
        |   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2norm,
        | len(embedding) AS dim
        |FROM embeddings""".stripMargin,
    "q14_tile_assign" ->
      """WITH pts AS (SELECT o_orderkey AS pid,
        |  (o_orderkey * 7919) % 20001 - 10000 AS x,
        |  (o_orderkey * 104729) % 20001 - 10000 AS y FROM orders)
        |SELECT CAST(floor((x + 10000) / 500) AS BIGINT) AS tx,
        |       CAST(floor((y + 10000) / 500) AS BIGINT) AS ty,
        |       count(*) AS n_points, min(pid) AS min_pid
        |FROM pts GROUP BY 1, 2""".stripMargin,
    "q15_dist_join" ->
      """WITH pts AS (SELECT o_orderkey AS pid,
        |  (o_orderkey * 7919) % 20001 - 10000 AS x,
        |  (o_orderkey * 104729) % 20001 - 10000 AS y FROM orders)
        |SELECT a.pid AS a_pid, b.pid AS b_pid,
        |  (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS dist2
        |FROM pts a JOIN pts b
        |  ON a.pid < b.pid
        | AND b.x BETWEEN a.x - 300 AND a.x + 300
        | AND b.y BETWEEN a.y - 300 AND a.y + 300
        |WHERE (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 90000""".stripMargin,
    "q16_knn" ->
      """WITH pts AS (SELECT o_orderkey AS pid,
        |  (o_orderkey * 7919) % 20001 - 10000 AS x,
        |  (o_orderkey * 104729) % 20001 - 10000 AS y FROM orders),
        |q AS (SELECT pid AS q_pid, x AS qx, y AS qy FROM pts WHERE pid % 1000 = 0)
        |SELECT q_pid, pid, dist2, rk FROM (
        | SELECT q.q_pid, p.pid,
        |  (p.x-q.qx)*(p.x-q.qx) + (p.y-q.qy)*(p.y-q.qy) AS dist2,
        |  row_number() OVER (PARTITION BY q.q_pid
        |    ORDER BY (p.x-q.qx)*(p.x-q.qx) + (p.y-q.qy)*(p.y-q.qy) ASC, p.pid ASC) AS rk
        | FROM pts p CROSS JOIN q WHERE p.pid <> q.q_pid)
        |WHERE rk <= 3""".stripMargin,
    // greedy sequential fill is inherently recursive (the bin boundary
    // depends on every prior fill), hence the recursive CTE twin stepping
    // one rank at a time per class
    "q27_seq_pack" ->
      """WITH RECURSIVE d AS (
        | SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |   CAST(((doc_id % 8) + 8) % 8 AS BIGINT) AS cls,
        |   COALESCE(CAST(length(text) - length(replace(text, ' ', '')) + 1
        |     AS BIGINT), 0) AS tok
        | FROM documents WHERE doc_id IS NOT NULL),
        |o AS (SELECT doc_id, cls, tok,
        |  row_number() OVER (PARTITION BY cls ORDER BY doc_id) AS rn
        | FROM d),
        |rec AS (
        | SELECT cls, rn, doc_id, tok, CAST(0 AS BIGINT) AS bin,
        |   tok AS fill
        | FROM o WHERE rn = 1
        | UNION ALL
        | SELECT o.cls, o.rn, o.doc_id, o.tok,
        |   CASE WHEN rec.fill + o.tok > 256 THEN rec.bin + 1
        |        ELSE rec.bin END,
        |   CASE WHEN rec.fill + o.tok > 256 THEN o.tok
        |        ELSE rec.fill + o.tok END
        | FROM o JOIN rec ON o.cls = rec.cls AND o.rn = rec.rn + 1)
        |SELECT doc_id, cls, bin, tok FROM rec""".stripMargin
  )
}
