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

  /** Defer deletion to JVM exit. The write-once-then-read query gates
    * return DataFrames whose lineage READS the scratch index; deleting it
    * eagerly forced an extra materialization (localCheckpoint) of the
    * whole join result inside the query builder — serializing and
    * re-reading millions of rows per run (guide §5: cache only what is
    * reused). Keeping the few-MB scratch dir until exit lets the caller's
    * one real action be the only execution. Paths are per-invocation temp
    * dirs, so nothing is ever shared or reused across runs. */
  private lazy val exitPaths = {
    val ps = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      ps.forEach(p => rm(p))))
    ps
  }

  def rmOnExit(path: String): Unit = exitPaths.add(path)
}
