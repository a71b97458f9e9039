package graft

import org.apache.spark.sql.SparkSession

/** Scratch-directory helper for write-once-then-read index gates: temp
  * dirs are created under the session's `spark.local.dir` — the scratch
  * volume the engine already shuffles through (tmpfs in the bench
  * sessions; this sandbox kernel makes disk syscalls expensive, see
  * build.sbt) — with the JVM tmpdir as fallback. Placement only: the
  * written bytes and every computation over them are unchanged.
  */
object Scratch {
  def dir(spark: SparkSession, prefix: String): String = {
    val base = spark.sparkContext.getConf.getOption("spark.local.dir")
      .map(_.split(",")(0))
      .getOrElse(System.getProperty("java.io.tmpdir"))
    val f = new java.io.File(base)
    f.mkdirs()
    java.nio.file.Files.createTempDirectory(f.toPath, prefix)
      .toAbsolutePath.toString
  }

  /** Recursive delete (best effort). */
  def rm(path: String): Unit = {
    def rec(f: java.io.File): Unit = {
      val cs = f.listFiles(); if (cs != null) cs.foreach(rec); f.delete()
    }
    rec(new java.io.File(path))
  }
}
