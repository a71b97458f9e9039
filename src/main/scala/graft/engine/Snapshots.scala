package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Parquet-backed snapshot tables with manifests, per-partition lineage
  * metrics, and checkpoint-resume — the role Iceberg plays in the north
  * rule, implemented on plain files since no Iceberg jars ship offline
  * (SURVEY.md §7). Layout:
  *
  *   root/
  *     s<id>/part-*.parquet        snapshot data
  *     _graft_meta/snapshots.jsonl one JSON line per committed snapshot
  *
  * A snapshot line records: id, parent id, wall-clock, input fingerprint,
  * row count, byte size, file count, and per-partition (partitionId ->
  * rows) lineage. Writes are atomic at the manifest append: a crashed job
  * leaves an orphan s<id> dir that is never referenced and is re-written
  * on resume.
  */
object Snapshots {

  final case class Snap(
      id: Long,
      parent: Long,
      ts: Long,
      fingerprint: String,
      rows: Long,
      bytes: Long,
      files: Int,
      partRows: Map[Int, Long])

  private def metaDir(root: String): Path = Paths.get(root, "_graft_meta")
  private def manifest(root: String): Path =
    metaDir(root).resolve("snapshots.jsonl")

  def snapshots(root: String): Seq[Snap] = {
    val m = manifest(root)
    if (!Files.exists(m)) Nil
    else Files.readAllLines(m).asScala.toSeq.filter(_.nonEmpty).map(parse)
  }

  def latest(root: String): Option[Snap] =
    snapshots(root).sortBy(_.id).lastOption

  /** Write df as a new snapshot; returns the committed snapshot. */
  def write(spark: SparkSession, df: DataFrame, root: String,
      fingerprint: String): Snap = {
    val prev = latest(root)
    val id = prev.map(_.id + 1).getOrElse(0L)
    val dir = Paths.get(root, s"s$id")

    // per-partition lineage rows: spark_partition_id -> row count
    val withPid = df.withColumn("_pid", spark_partition_id())
    withPid.write.mode("overwrite").parquet(dir.toString)
    val partRows = spark.read.parquet(dir.toString)
      .groupBy(col("_pid")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rows = partRows.values.sum
    val listing = Files.list(dir)
    val files =
      try listing.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .toList
      finally listing.close()
    val bytes = files.map(Files.size).sum

    val snap = Snap(id, prev.map(_.id).getOrElse(-1L),
      System.currentTimeMillis(), fingerprint, rows, bytes, files.size,
      partRows)
    Files.createDirectories(metaDir(root))
    Files.write(manifest(root), (render(snap) + "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    snap
  }

  /** Read a snapshot (latest by default), dropping the lineage column. */
  def read(spark: SparkSession, root: String, id: Long = -1L): DataFrame = {
    val snap =
      if (id >= 0) snapshots(root).find(_.id == id).get
      else latest(root).getOrElse(sys.error(s"no snapshots in $root"))
    spark.read.parquet(Paths.get(root, s"s${snap.id}").toString).drop("_pid")
  }

  /** Checkpoint-resume: recompute only if no committed snapshot carries
    * this fingerprint (input identity); otherwise read the snapshot. */
  def stage(spark: SparkSession, root: String, fingerprint: String)(
      compute: => DataFrame): DataFrame = {
    snapshots(root).filter(_.fingerprint == fingerprint).sortBy(_.id)
      .lastOption match {
      case Some(s) =>
        spark.read.parquet(Paths.get(root, s"s${s.id}").toString).drop("_pid")
      case None =>
        write(spark, compute, root, fingerprint)
        read(spark, root)
    }
  }

  // minimal JSON (flat schema, no nesting beyond the partRows map)
  private def render(s: Snap): String = {
    val pr = s.partRows.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    s"""{"id":${s.id},"parent":${s.parent},"ts":${s.ts},""" +
      s""""fingerprint":"${s.fingerprint}","rows":${s.rows},""" +
      s""""bytes":${s.bytes},"files":${s.files},"partRows":$pr}"""
  }

  private def parse(line: String): Snap = {
    def num(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(line).get.group(1).toLong
    val fp = s""""fingerprint":"([^"]*)"""".r
      .findFirstMatchIn(line).get.group(1)
    val prBody = """"partRows":\{([^}]*)\}""".r
      .findFirstMatchIn(line).get.group(1)
    val pr =
      if (prBody.isEmpty) Map.empty[Int, Long]
      else prBody.split(",").map { kv =>
        val Array(k, v) = kv.split(":")
        k.replace("\"", "").toInt -> v.toLong
      }.toMap
    Snap(num("id"), num("parent"), num("ts"), fp, num("rows"), num("bytes"),
      num("files").toInt, pr)
  }
}
