package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** §2.14 A/B measurement: fingerprint as expression vs as scalar UDF,
  * over the sf documents corpus. Not part of the driver bench (graft.Bench
  * runs the 126 declared queries); run ad hoc:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.functions.FingerprintAbBench"
  *
  * Prints one JSON line with median-of-3 seconds per form. Recorded
  * result (this machine, sf0.1, local[32]) lives in SURVEY §8 / SCALE.md.
  */
object FingerprintAbBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).persist()
    docs.count() // materialize once so neither form pays the scan

    def time3(tag: String, mk: () => Long): Double = {
      mk() // untimed warmup (codegen/JIT)
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      runs(1)
    }
    // identical consumer both sides: hash-agg over the fingerprint so the
    // timed work is fingerprint evaluation + one tiny aggregate
    val exprSec = time3("expr", () =>
      docs.select(FingerprintForms.expr(col("text")).as("fp"))
        .agg(count_distinct(col("fp"))).head().getLong(0))
    val udfSec = time3("udf", () =>
      docs.select(FingerprintForms.udfForm(col("text")).as("fp"))
        .agg(count_distinct(col("fp"))).head().getLong(0))
    // driver-parse convention: raw JSON as the LAST stdout line
    println(s"""{"metric":"fingerprint_ab","expr_sec":$exprSec,"udf_sec":$udfSec,"udf_over_expr":${udfSec / exprSec},"sf":"$sfDir"}""")
    spark.stop()
  }
}
