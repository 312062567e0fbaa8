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
    val (spark, sfDir) = BenchHarness.session()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).persist()
    docs.count() // materialize once so neither form pays the scan

    // identical consumer both sides: hash-agg over the fingerprint so the
    // timed work is fingerprint evaluation + one tiny aggregate;
    // interleaved so neither form inherits the other's JIT/cache warmth
    val (exprSec, udfSec) = BenchHarness.abMedians(
      () => docs.select(FingerprintForms.expr(col("text")).as("fp"))
        .agg(count_distinct(col("fp"))).head().getLong(0),
      () => docs.select(FingerprintForms.udfForm(col("text")).as("fp"))
        .agg(count_distinct(col("fp"))).head().getLong(0))
    // driver-parse convention: raw JSON as the LAST stdout line
    println(s"""{"metric":"fingerprint_ab","expr_sec":$exprSec,"udf_sec":$udfSec,"udf_over_expr":${udfSec / exprSec},"sf":"$sfDir"}""")
    spark.stop()
  }
}
