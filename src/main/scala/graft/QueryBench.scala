package graft
import org.apache.spark.sql.SparkSession

/** Single-query timing harness — median of 3 after an untimed warmup run
  * of the SAME query, for settling per-query perf questions without a
  * full 127-query Bench sweep (whose single-run noise envelope is ±30%).
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.QueryBench <name> [sfDir]"
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // untimed warmup (JVM/codegen/page cache)
    val runs = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    val med = runs.sorted.apply(1)
    spark.stop()
    println(s"""{"metric":"query","name":"$name","runs":[${runs.map(r => f"$r%.3f").mkString(",")}],"median":${f"$med%.3f"},"sf":"$sfDir"}""")
  }
}
