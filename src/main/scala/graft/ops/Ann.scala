package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the embeddings table: brute-force cosine top-k
  * as the exact baseline, and a random-hyperplane LSH-bucketed variant as
  * the scale path (bucket equi-join shuffles instead of a cross join).
  * Hyperplanes are small integer vectors derived from a fixed formula so
  * the DuckDB oracle reproduces them exactly.
  */
object Ann {

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))

  private def cos(va: Column, vb: Column, na: Column, nb: Column): Column =
    aggregate(zip_with(va, vb, (x, y) => x * y), lit(0.0), (a, x) => a + x) /
      (na * nb)

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("norm",
      sqrt(aggregate(col("v"), lit(0.0), (a, x) => a + x * x)))

  /** Exact cosine top-k for a query sample (broadcast queries). */
  def bruteTopK(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = withNorm(emb(s, dir))
    val q = e.filter(col("vec_id") % 50 === 0)
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

  /** LSH bucket id: sign bits of dot(v, h_j) for 6 integer hyperplanes
    * h_j(d) = ((j*131 + d*31) % 17) - 8. */
  private def bucket(v: Column): Column = {
    val bits = (0 until 6).map { j =>
      val dotj = aggregate(
        zip_with(v,
          transform(sequence(lit(0), size(v) - 1),
            d => ((lit(j * 131) + d * 31) % 17 - 8).cast("double")),
          (x, h) => x * h),
        lit(0.0), (a, x) => a + x)
      when(dotj > 0, lit(1)).otherwise(lit(0)).cast("string")
    }
    concat(bits: _*)
  }

  /** Bucketed approximate top-k: candidates share the LSH bucket, ranked
    * by exact cosine within the bucket. */
  def lshTopK(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val e = withNorm(emb(s, dir)).withColumn("bkt", bucket(col("v")))
    val q = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("norm").as("qn"), col("bkt"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    e.join(q, Seq("bkt"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cos(col("v"), col("qv"), col("norm"), col("qn")), 6)
          .as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_ann_brute" -> ((s: SparkSession, d: String) => bruteTopK(s, d)),
    "q23_ann_lsh" -> ((s: SparkSession, d: String) => lshTopK(s, d)))

  private val normSql =
    """SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
      | sqrt(list_sum(list_transform(embedding,
      |   x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS norm
      |FROM embeddings""".stripMargin

  private val cosSql =
    """list_sum(list_transform(range(1, CAST(len(e.v)+1 AS INTEGER)),
      | i -> e.v[i] * q.qv[i])) / (e.norm * q.qn)""".stripMargin
      .replace("\n", "")

  private val bktSql = (alias: String) =>
    (0 until 6).map { j =>
      s"""CASE WHEN list_sum(list_transform(
         | range(1, CAST(len($alias.v)+1 AS INTEGER)),
         | i -> $alias.v[i] * ((($j*131 + (i-1)*31) % 17) - 8))) > 0
         | THEN '1' ELSE '0' END""".stripMargin.replace("\n", "")
    }.mkString(" || ")

  val oracles: Map[String, String] = Map(
    "q22_ann_brute" ->
      s"""WITH n AS ($normSql)
         |SELECT q_id, vec_id, cosine, rk FROM (
         | SELECT q.q_id, e.vec_id,
         |  round($cosSql, 6) AS cosine,
         |  row_number() OVER (PARTITION BY q.q_id
         |    ORDER BY round($cosSql, 6) DESC, e.vec_id ASC) AS rk
         | FROM n e CROSS JOIN
         |  (SELECT vec_id AS q_id, v AS qv, norm AS qn FROM n
         |   WHERE vec_id % 50 = 0) q
         | WHERE e.vec_id <> q.q_id)
         |WHERE rk <= 5""".stripMargin,
    "q23_ann_lsh" ->
      s"""WITH n AS ($normSql),
         |b AS (SELECT vec_id, v, norm, ${bktSql("n")} AS bkt FROM n n)
         |SELECT q_id, vec_id, cosine, rk FROM (
         | SELECT q.q_id, e.vec_id,
         |  round($cosSql, 6) AS cosine,
         |  row_number() OVER (PARTITION BY q.q_id
         |    ORDER BY round($cosSql, 6) DESC, e.vec_id ASC) AS rk
         | FROM b e JOIN
         |  (SELECT vec_id AS q_id, v AS qv, norm AS qn, bkt FROM b
         |   WHERE vec_id % 50 = 0) q
         |  ON e.bkt = q.bkt
         | WHERE e.vec_id <> q.q_id)
         |WHERE rk <= 3""".stripMargin)
}
