package graft
import org.apache.spark.sql.SparkSession
object QProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("QPROBE_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("QPROBE_STAGES"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val i = sc.stageInfo
            val wall = (i.completionTime.getOrElse(0L) -
              i.submissionTime.getOrElse(0L)) / 1e3
            val cpu = i.taskMetrics.executorCpuTime / 1e9
            val run = i.taskMetrics.executorRunTime / 1e3
            val gc = i.taskMetrics.jvmGCTime / 1e3
            if (wall > 0.3) println(
              f"[stage] ${i.stageId}%3d tasks=${i.numTasks}%4d " +
                f"wall=$wall%7.2f run=$run%8.1f cpu=$cpu%8.1f gc=$gc%6.1f " +
                f"  ${i.name.takeWhile(_ != '\n').take(60)}")
          }
        })
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (q <- args.drop(1)) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(f"[qprobe] $q rows=$n sec=${(System.nanoTime()-t0)/1e9}%.2f")
      val t1 = System.nanoTime()
      val n2 = SparkEntry.queries(q)(spark, dir).count()
      println(f"[qprobe] $q(2nd) rows=$n2 sec=${(System.nanoTime()-t1)/1e9}%.2f")
    }
    spark.stop()
  }
}
