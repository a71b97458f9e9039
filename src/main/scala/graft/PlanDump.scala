package graft
import org.apache.spark.sql.SparkSession

/** Measurement-only helper (guide §1.4/§7.2): dumps `explain("formatted")`
  * of declared queries to files, and optionally the EXECUTED plan (with
  * per-operator metric values) after running the query once. Not part of
  * the bench contract; Bench.scala / Verify.scala are untouched.
  *
  * usage: runMain graft.PlanDump <sfDir> <outDir> [query...]
  *        (no query args = all declared queries)
  * env:   PLANDUMP_EXEC=1  also run each query (count) and append every
  *        action's final AQE plan with metric values.
  */
object PlanDump {

  private def dumpExec(p: org.apache.spark.sql.execution.SparkPlan,
      depth: Int, sb: StringBuilder): Unit = {
    import org.apache.spark.sql.execution._
    val m = p.metrics
      .filter { case (_, v) => v.value != 0 && v.value != -1 }
      .map { case (k, v) => s"$k=${v.value}" }.mkString(", ")
    sb.append("  " * depth).append(p.nodeName)
      .append(if (m.nonEmpty) s" [$m]" else "").append('\n')
    p match {
      case a: adaptive.AdaptiveSparkPlanExec =>
        dumpExec(a.executedPlan, depth + 1, sb)
      case q: adaptive.QueryStageExec => dumpExec(q.plan, depth + 1, sb)
      case r: exchange.ReusedExchangeExec =>
        sb.append("  " * (depth + 1)).append("(reused)\n")
      case _ => p.children.foreach(dumpExec(_, depth + 1, sb))
    }
    p.subqueries.foreach { sq =>
      sb.append("  " * (depth + 1)).append("Subquery:\n")
      dumpExec(sq, depth + 2, sb)
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = args(1)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val exec = sys.env.contains("PLANDUMP_EXEC")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val execPlans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    if (exec)
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            val sb = new StringBuilder
            sb.append(f"== action $funcName ${durationNs / 1e9}%.2fs ==%n")
            try dumpExec(qe.executedPlan, 0, sb)
            catch { case e: Throwable => sb.append(s"<dump failed: $e>\n") }
            execPlans.add(sb.toString)
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    new java.io.File(out).mkdirs()
    for (q <- names) {
      try {
        execPlans.clear()
        val df = SparkEntry.queries(q)(spark, dir)
        val sb = new StringBuilder
        sb.append(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        if (exec) {
          val t0 = System.nanoTime()
          val n = df.count()
          val secs = (System.nanoTime() - t0) / 1e9
          org.apache.spark.sql.GraftInternal.drainListenerBus(spark)
          sb.append(f"%n-- executed: rows=$n sec=$secs%.2f%n%n")
          execPlans.forEach(p => sb.append(p).append('\n'))
        }
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$out/$q.txt"), sb.toString)
        println(s"[plandump] $q ok")
      } catch {
        case e: Throwable => println(s"[plandump] $q FAILED: $e")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
