package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the embeddings table: brute-force cosine top-k
  * as the exact baseline, and a multi-table banded hyperplane-LSH variant
  * as the scale path (bucket equi-joins shuffle only candidates that share
  * a bucket in at least one table — no cross join anywhere).
  *
  * Hyperplanes are small integer vectors from a fixed formula
  * h_{t,j}(d) = (((d+1) * (t*7919 + j*104729 + 12345)) % 1000003) % 17 - 8
  * so the DuckDB oracle reproduces them exactly. The band width (bits per
  * table) adapts to the table size — log2(n/32) bits keeps expected bucket
  * occupancy ~32 at any scale, which is what bounds the within-bucket join
  * at 100 TB; TABLES independent tables plus Hamming<=2 multiprobe on the
  * query side recover the recall a single band loses (measured recall@3
  * >= 0.93 vs brute force on the driver's embeddings, see AnnSpec).
  */
/** Centroid ranking for IVF assignment, shared by interpreted eval and
  * codegen. Holds the bounded codebook as flat primitive arrays (ids,
  * concatenated centroid vectors, norms) — it ships inside the serialized
  * plan once per stage, like the broadcast it replaces, but the per-row
  * path reads the input vector's ArrayData in place: no boxed Seq[Double],
  * no per-row codebook lookup indirection. Scoring and tie-breaks are
  * EXACTLY the r3 UDF's (dot in index order, sort by (-cos, cid)), so the
  * q24 DuckDB oracle stays double-for-double. */
final class IvfRank(ids: Array[Long], flat: Array[Double],
    norms: Array[Double], m: Int) extends Serializable {
  def rank(v: org.apache.spark.sql.catalyst.util.ArrayData,
      norm: Double): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = ids.length
    val dim = if (n == 0) 0 else flat.length / n
    val scored = new Array[(Double, Long)](n)
    var ci = 0
    while (ci < n) {
      var dot = 0.0
      var i = 0
      val off = ci * dim
      while (i < dim) { dot += v.getDouble(i) * flat(off + i); i += 1 }
      scored(ci) = (dot / (norm * norms(ci)), ids(ci))
      ci += 1
    }
    val top = scored.sortBy { case (cos, cid) => (-cos, cid) }
      .take(m).map(_._2)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(top)
  }
}

/** `IvfRank.rank` as a codegen'd expression: array<bigint> of the top-m
  * centroid ids for (v, norm). Children are the engine's own non-nullable
  * columns, so null handling is skipped by construction. */
case class IvfRankExpr(v: org.apache.spark.sql.catalyst.expressions.Expression,
    norm: org.apache.spark.sql.catalyst.expressions.Expression,
    ranker: IvfRank)
    extends org.apache.spark.sql.catalyst.expressions.Expression {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

  override def children: Seq[Expression] = Seq(v, norm)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any =
    ranker.rank(v.eval(input).asInstanceOf[ArrayData],
      norm.eval(input).asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfRank", ranker,
      classOf[IvfRank].getName)
    val cks = children.map(_.genCode(ctx))
    ev.copy(
      code = cks.map(_.code).reduce(_ + _) + code"""
        final org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.rank(${cks(0).value}, ${cks(1).value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): IvfRankExpr =
    copy(v = newChildren(0), norm = newChildren(1))
}

/** Bucket-string kernel for [[Ann.buckets]], shared by interpreted eval
  * and codegen (same shape as [[IvfRank]]). Reads the input vector's
  * ArrayData in place — no boxed Seq[Double] per row — and runs all
  * tables x bits dot products in ONE fused loop (the r2 column
  * formulation of the same math generated a codegen unit so large that
  * Janino compilation alone took ~25 s; the r4 fix fused the loop into a
  * UDF but still boxed every vector). */
final class BucketsOf(tables: Int, bits: Int) extends Serializable {
  def of(v: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val d = v.numElements()
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      val sb = new java.lang.StringBuilder(bits)
      var j = 0
      while (j < bits) {
        val stride = t * 7919L + j * 104729L + 12345L
        var dot = 0.0
        var i = 0
        while (i < d) {
          dot += v.getDouble(i) * (((i + 1) * stride) % 1000003L % 17L - 8L)
          i += 1
        }
        sb.append(if (dot > 0) '1' else '0')
        j += 1
      }
      out(t) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** [[BucketsOf.of]] as a codegen'd expression: array<string> of the
  * per-table bucket strings for an embedding vector. The child is the
  * engine's own non-nullable column, so null handling is skipped by
  * construction. */
case class BucketsExpr(
    v: org.apache.spark.sql.catalyst.expressions.Expression,
    kernel: BucketsOf)
    extends org.apache.spark.sql.catalyst.expressions.Expression {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

  override def children: Seq[Expression] = Seq(v)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any =
    kernel.of(v.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketsOf", kernel,
      classOf[BucketsOf].getName)
    val ck = v.genCode(ctx)
    ev.copy(
      code = ck.code + code"""
        final org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.of(${ck.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BucketsExpr =
    copy(v = newChildren(0))
}

/** Hamming<=2 probe-set kernel for [[Ann.multiprobe]]: the no-flip
  * bucket, every single-bit flip, and every two-bit flip — bounded at
  * 1 + bits + bits*(bits-1)/2 strings per bucket. Emission order matches
  * the r4 UDF exactly (no-flip, then per i: flip_i followed by
  * flip_{i,j} for j>i). */
final class ProbesOf(bits: Int) extends Serializable {
  def of(bkt: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val base = bkt.toString.toCharArray
    val out = new Array[Any](1 + bits + bits * (bits - 1) / 2)
    var k = 0
    out(k) = UTF8String.fromString(new String(base)); k += 1
    var i = 0
    while (i < bits) {
      val one = base.clone()
      one(i) = if (one(i) == '1') '0' else '1'
      out(k) = UTF8String.fromString(new String(one)); k += 1
      var j = i + 1
      while (j < bits) {
        val two = one.clone()
        two(j) = if (two(j) == '1') '0' else '1'
        out(k) = UTF8String.fromString(new String(two)); k += 1
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** [[ProbesOf.of]] as a codegen'd expression: array<string> of the
  * multiprobe bucket strings for a query bucket. */
case class ProbesExpr(
    bkt: org.apache.spark.sql.catalyst.expressions.Expression,
    kernel: ProbesOf)
    extends org.apache.spark.sql.catalyst.expressions.Expression {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._
  import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

  override def children: Seq[Expression] = Seq(bkt)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any =
    kernel.of(bkt.eval(input)
      .asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("probesOf", kernel,
      classOf[ProbesOf].getName)
    val ck = bkt.genCode(ctx)
    ev.copy(
      code = ck.code + code"""
        final org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.of(${ck.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ProbesExpr =
    copy(bkt = newChildren(0))
}

object Ann {

  final val TABLES = 4

  private def emb(s: SparkSession, dir: String): DataFrame =
    graft.Tables.parquet(s, s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))

  private def cos(va: Column, vb: Column, na: Column, nb: Column): Column =
    aggregate(zip_with(va, vb, (x, y) => x * y), lit(0.0), (a, x) => a + x) /
      (na * nb)

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("norm",
      sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))

  /** Band width: expected bucket occupancy ~32 vectors per table. */
  def bitsFor(n: Long): Int =
    math.max(4, math.min(20,
      (math.log(n / 32.0) / math.log(2)).round.toInt))

  /** (vec_id, t, bkt) for every table t: bkt = sign bits of the dots with
    * the table's `bits` hyperplanes, in j order. Each plane's component
    * sequence uses its own stride ((d+1) * plane-specific multiplier mod a
    * large prime, folded to [-8,8]) — a shared stride would make every
    * plane a cyclic shift of one base sequence and the tables would stop
    * being independent.
    *
    * Implementation note: ONE fused primitive loop per vector via the
    * codegen'd [[BucketsExpr]] reading the vector's ArrayData in place.
    * The r2 formulation (tables x bits nested aggregate/zip_with/transform
    * columns) generated a codegen unit so large that Janino compilation
    * alone took ~25 s of the query's ~30 s wall — the work itself is
    * milliseconds; the r4 fix fused the loop but boxed every vector into a
    * Seq[Double] through a UDF. */
  def buckets(e: DataFrame, tables: Int, bits: Int): DataFrame = {
    import org.apache.spark.sql.GraftInternal.{colOf, exprOf}
    val bucketsCol = colOf(
      BucketsExpr(exprOf(col("v")), new BucketsOf(tables, bits)))
    e.select(col("vec_id"), posexplode(bucketsCol).as(Seq("t", "bkt")))
      .select(col("vec_id"), col("t"), col("bkt"))
  }

  /** Hamming<=2 multiprobe expansion of query buckets: the no-flip bucket,
    * every single-bit flip, and every two-bit flip. Bounded: 1 + bits +
    * bits*(bits-1)/2 probes per (query, table); the codegen'd
    * [[ProbesExpr]] emits the whole probe set per bucket (same
    * codegen-size rationale as [[buckets]], no boxed String per row). */
  def multiprobe(bq: DataFrame, bits: Int): DataFrame = {
    import org.apache.spark.sql.GraftInternal.{colOf, exprOf}
    val probesCol = colOf(ProbesExpr(exprOf(col("bkt")), new ProbesOf(bits)))
    bq.select(col("q_id"), col("t"), explode(probesCol).as("bkt"))
      .distinct()
  }

  /** Candidate (q_id, vec_id) pairs sharing a bucket in >=1 table, for a
    * query-side predicate. */
  def lshCandidates(e: DataFrame, queryPred: Column, tables: Int,
      bits: Int): DataFrame = {
    val b = buckets(e, tables, bits)
    val bq = multiprobe(
      b.filter(queryPred)
        .select(col("vec_id").as("q_id"), col("t"), col("bkt")),
      bits)
    b.join(bq, Seq("t", "bkt"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
      .distinct()
  }

  /** Query-sample cap for the brute-force baseline: the broadcast query
    * side is at most this many rows AT ANY n (r4 verdict: the former
    * `vec_id % 50` sample grew the broadcast side as n/50, making the
    * baseline O(n^2/50) at deployment scale). Stride sampling in integer
    * arithmetic so the DuckDB twin reproduces the exact id set. */
  final val BRUTE_MAX_QUERIES = 64

  /** Exact cosine top-k for a bounded query sample (broadcast queries,
    * O(1) rows: stride = n/BRUTE_MAX_QUERIES, ids capped below
    * stride*BRUTE_MAX_QUERIES). Kept as the exact baseline / recall
    * oracle of [[lshTopK]]/[[ivfTopK]]; `queryPred` overrides the sample
    * when a caller needs the baseline on a specific query set (AnnSpec
    * recall measurement against the %50 LSH queries). */
  def bruteTopK(s: SparkSession, dir: String, k: Int = 5,
      queryPred: Column = null): DataFrame = {
    // persisted: e feeds the stride count, the broadcast query side and
    // the scan side, each of which re-ran the cast + norm; the count
    // below materializes the cache (same pattern as ivfTopK/cosinePairs)
    val e = withNorm(emb(s, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pred =
      if (queryPred != null) queryPred
      else {
        val stride = math.max(1L, e.count() / BRUTE_MAX_QUERIES)
        col("vec_id") % stride === 0 &&
          col("vec_id") < stride * BRUTE_MAX_QUERIES
      }
    val q = e.filter(pred)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("norm").as("qn"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cos(col("v"), col("qv"), col("norm"), col("qn")), 6)
          .as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Approximate top-k: multi-table LSH candidates ranked by exact cosine. */
  def lshTopK(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    // persisted: e feeds the bitsFor count, the bucket table, and the
    // two exact-cosine score joins; the count materializes the cache
    val e = withNorm(emb(s, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bits = bitsFor(e.count())
    val cands = lshCandidates(e, col("vec_id") % 50 === 0, TABLES, bits)
    val q = e.select(col("vec_id").as("q_id"), col("v").as("qv"),
      col("norm").as("qn"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    cands
      .join(e, Seq("vec_id"))
      .join(q, Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cos(col("v"), col("qv"), col("norm"), col("qn")), 6)
          .as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  // ------------------------------------------------------------------ IVF
  //
  // The second scale path (builder brief: "an IVF or LSH-bucketed variant"):
  // a BOUNDED coarse codebook (<= IVF_MAX_CELLS centroids = a deterministic
  // id-stride sample of the vectors), every vector assigned to its nearest
  // centroid by cosine (the inverted file — a plain `cell` column, i.e. the
  // shuffle/partition key at scale), and each query probing only its
  // IVF_NPROBE nearest cells. The codebook is the only driver-side state
  // and never exceeds IVF_MAX_CELLS entries regardless of n, so the
  // broadcast stays O(1) while the candidate join is a cell equi-join —
  // the same shape that bounds the spatial join at 100 TB.

  final val IVF_MAX_CELLS = 1024
  /** Probe fraction vs recall: the driver's embeddings are ISOTROPIC
    * (measured within-label mean cos 0.00037 vs cross-label 0.00040 at
    * sf0.1 — no cluster structure at all), the adversarial case for any
    * cell-partitioned ANN. nprobe=8 of ~sqrt(n) cells scans ~11% of the
    * data for recall@3 ~0.54 (vs 0.11 for random cells — the gain is
    * neighbors of the centroid-vector concentrating in its cell; Lloyd
    * refinement measured at most +0.06 and is not plain-SQL-oracle-able).
    * On clustered real embeddings the same index recalls far higher at
    * the same probe fraction. */
  final val IVF_NPROBE = 8

  /** Codebook stride: centroids are vec_id % stride == 0, aiming for
    * ~sqrt(n) cells clamped to [4, IVF_MAX_CELLS]. Integer arithmetic only
    * so the DuckDB oracle reproduces it exactly. */
  def ivfStride(n: Long): Long = {
    val c = math.max(4L, math.min(IVF_MAX_CELLS.toLong,
      math.round(math.sqrt(n.toDouble))))
    math.max(1L, n / c)
  }

  /** Approximate top-k: nearest-centroid inverted file, nprobe cells per
    * query, exact cosine rank on the probed candidates. */
  def ivfTopK(s: SparkSession, dir: String, k: Int = 3,
      nprobe: Int = IVF_NPROBE): DataFrame = {
    // persisted: e feeds five consumers (stride count, codebook collect,
    // the assignment, and the two exact-cosine score joins), each of which
    // re-ran the cast + norm over every embedding; the stride count
    // materializes the cache
    val e = withNorm(emb(s, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stride = ivfStride(e.count())
    // bounded codebook (<= IVF_MAX_CELLS rows at any scale)
    val cents = e.filter(col("vec_id") % stride === 0)
      .select(col("vec_id"), col("v"), col("norm"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    // top-m centroid ids by cosine, ties to the smaller id — the exact
    // order row_number() OVER (ORDER BY cos DESC, cid ASC) yields, so the
    // oracle's assignment matches double-for-double (dots are summed in
    // index order on both sides, like the q23 bucket signs). Codebook as
    // flat primitive arrays inside a codegen'd expression (the r3 version
    // boxed every vector into a Seq[Double] per row).
    val ranker1 = new IvfRank(cents.map(_._1),
      cents.flatMap(_._2), cents.map(_._3), 1)
    val rankerN = new IvfRank(cents.map(_._1),
      cents.flatMap(_._2), cents.map(_._3), nprobe)
    import org.apache.spark.sql.GraftInternal.{colOf, exprOf}
    def rankCol(r: IvfRank) = colOf(
      IvfRankExpr(exprOf(col("v")), exprOf(col("norm")), r))
    // the nearest-centroid assignment is the expensive projection here
    // (one full codebook scan per vector); it feeds both the probe side
    // and the candidate join, which re-ran it end to end — cache the
    // assignment, not just the embeddings
    val assigned = e.select(col("vec_id"), col("v"), col("norm"),
        rankCol(ranker1).getItem(0).as("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probes = assigned.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"),
        explode(rankCol(rankerN)).as("cell"))
    val cands = probes.join(assigned.select(col("vec_id"), col("cell")),
        Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
      .distinct()
    val q = e.select(col("vec_id").as("q_id"), col("v").as("qv"),
      col("norm").as("qn"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    cands
      .join(e, Seq("vec_id"))
      .join(q, Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cos(col("v"), col("qv"), col("norm"), col("qn")), 6)
          .as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_ann_brute" -> ((s: SparkSession, d: String) => bruteTopK(s, d)),
    "q23_ann_lsh" -> ((s: SparkSession, d: String) => lshTopK(s, d)),
    "q24_ann_ivf" -> ((s: SparkSession, d: String) => ivfTopK(s, d)))

  private val normSql =
    """SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
      | sqrt(list_sum(list_transform(embedding,
      |   x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS norm
      |FROM embeddings""".stripMargin

  private val cosSql =
    """list_sum(list_transform(range(1, CAST(len(e.v)+1 AS INTEGER)),
      | i -> e.v[i] * q.qv[i])) / (e.norm * q.qn)""".stripMargin
      .replace("\n", "")

  /** The multi-table bucket table as SQL (mirrors [[buckets]], band width
    * from the same adaptive formula). Expects a CTE `n` with
    * (vec_id, v, norm) in scope; defines CTEs `params` and `b`. */
  val bktSql =
    s"""params AS (SELECT GREATEST(4, LEAST(20,
       |  CAST(round(log2(count(*)/32.0)) AS INTEGER))) AS bits
       | FROM embeddings),
       |b AS (
       | SELECT vec_id, t,
       |   string_agg(CASE WHEN dot > 0 THEN '1' ELSE '0' END, ''
       |              ORDER BY j) AS bkt
       | FROM (
       |  SELECT n.vec_id, ts.t, js.j,
       |   list_sum(list_transform(range(1, CAST(len(n.v)+1 AS INTEGER)),
       |    i -> n.v[i] *
       |      (((i * (ts.t*7919 + js.j*104729 + 12345)) % 1000003) % 17 - 8)))
       |    AS dot
       |  FROM n, (SELECT unnest(range(0, $TABLES)) AS t) ts,
       |       (SELECT unnest(range(0, (SELECT bits FROM params))) AS j) js)
       | GROUP BY vec_id, t)""".stripMargin

  /** Hamming<=2 multiprobe of the `bq` CTE (q_id, t, bkt), mirroring
    * [[multiprobe]]; defines CTEs `fl` and `probes`. */
  val probeSql =
    """fl AS (
      | SELECT q_id, t, f2,
      |  CASE WHEN f1 = 0 THEN bkt
      |       ELSE substr(bkt, 1, f1-1) ||
      |            (CASE WHEN substr(bkt, f1, 1) = '1' THEN '0' ELSE '1' END) ||
      |            substr(bkt, f1+1) END AS bkt
      | FROM bq,
      |  (SELECT unnest(range(0, (SELECT bits FROM params)+1)) AS f1) fs1,
      |  (SELECT unnest(range(0, (SELECT bits FROM params)+1)) AS f2) fs2
      | WHERE (f1 = 0 AND f2 = 0) OR (f1 = 0 AND f2 > 0)
      |    OR (f1 > 0 AND f2 > f1)),
      |probes AS (
      | SELECT DISTINCT q_id, t,
      |  CASE WHEN f2 = 0 THEN bkt
      |       ELSE substr(bkt, 1, f2-1) ||
      |            (CASE WHEN substr(bkt, f2, 1) = '1' THEN '0' ELSE '1' END) ||
      |            substr(bkt, f2+1) END AS bkt
      | FROM fl)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q22_ann_brute" ->
      s"""WITH n AS ($normSql),
         |p AS (SELECT GREATEST(1, count(*) // $BRUTE_MAX_QUERIES) AS stride
         |      FROM embeddings)
         |SELECT q_id, vec_id, cosine, rk FROM (
         | SELECT q.q_id, e.vec_id,
         |  round($cosSql, 6) AS cosine,
         |  row_number() OVER (PARTITION BY q.q_id
         |    ORDER BY round($cosSql, 6) DESC, e.vec_id ASC) AS rk
         | FROM n e CROSS JOIN
         |  (SELECT vec_id AS q_id, v AS qv, norm AS qn FROM n
         |   WHERE vec_id % (SELECT stride FROM p) = 0
         |     AND vec_id < (SELECT stride FROM p) * $BRUTE_MAX_QUERIES) q
         | WHERE e.vec_id <> q.q_id)
         |WHERE rk <= 5""".stripMargin,
    "q23_ann_lsh" ->
      s"""WITH n AS ($normSql),
         |$bktSql,
         |bq AS (SELECT vec_id AS q_id, t, bkt FROM b WHERE vec_id % 50 = 0),
         |$probeSql,
         |cand AS (
         | SELECT DISTINCT p.q_id, b.vec_id
         | FROM b JOIN probes p ON b.t = p.t AND b.bkt = p.bkt
         | WHERE b.vec_id <> p.q_id)
         |SELECT q_id, vec_id, cosine, rk FROM (
         | SELECT c.q_id, e.vec_id,
         |  round($cosSql, 6) AS cosine,
         |  row_number() OVER (PARTITION BY c.q_id
         |    ORDER BY round($cosSql, 6) DESC, e.vec_id ASC) AS rk
         | FROM cand c
         | JOIN n e ON e.vec_id = c.vec_id
         | JOIN (SELECT vec_id AS q_id, v AS qv, norm AS qn FROM n) q
         |   ON q.q_id = c.q_id)
         |WHERE rk <= 3""".stripMargin,
    "q24_ann_ivf" -> {
      // cosine(row of n aliased x, centroid row aliased c)
      val centCos =
        """list_sum(list_transform(range(1, CAST(len(x.v)+1 AS INTEGER)),
          | i -> x.v[i] * c.cv[i])) / (x.norm * c.cn)""".stripMargin
          .replace("\n", "")
      s"""WITH n AS ($normSql),
         |p AS (SELECT GREATEST(1, count(*) //
         |  GREATEST(4, LEAST($IVF_MAX_CELLS,
         |    CAST(round(sqrt(count(*))) AS BIGINT)))) AS stride
         | FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv, norm AS cn FROM n
         |      WHERE vec_id % (SELECT stride FROM p) = 0),
         |ranked AS (
         | SELECT x.vec_id, c.cid,
         |  row_number() OVER (PARTITION BY x.vec_id
         |    ORDER BY $centCos DESC, c.cid ASC) AS crk
         | FROM n x CROSS JOIN c),
         |a AS (SELECT vec_id, cid AS cell FROM ranked WHERE crk = 1),
         |probes AS (SELECT vec_id AS q_id, cid AS cell FROM ranked
         |           WHERE crk <= $IVF_NPROBE AND vec_id % 50 = 0),
         |cand AS (
         | SELECT DISTINCT p.q_id, a.vec_id
         | FROM probes p JOIN a ON a.cell = p.cell
         | WHERE a.vec_id <> p.q_id)
         |SELECT q_id, vec_id, cosine, rk FROM (
         | SELECT cd.q_id, e.vec_id,
         |  round($cosSql, 6) AS cosine,
         |  row_number() OVER (PARTITION BY cd.q_id
         |    ORDER BY round($cosSql, 6) DESC, e.vec_id ASC) AS rk
         | FROM cand cd
         | JOIN n e ON e.vec_id = cd.vec_id
         | JOIN (SELECT vec_id AS q_id, v AS qv, norm AS qn FROM n) q
         |   ON q.q_id = cd.q_id)
         |WHERE rk <= 3""".stripMargin
    })
}
