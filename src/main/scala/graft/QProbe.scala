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
