package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Micro-bench for the dedup map-side kernels (WordNgrams / MinHashSig /
  * SimHashVec / TokenCounts) — these sit on the 100 TB dedup budget, so
  * their per-row dispatch mode (CodegenFallback vs doGenCode) matters.
  * Isolates each pass over a persisted input (median of 3, untimed
  * warmup). Run ad hoc:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.functions.SigBench"
  */
object SigBench {
  def main(args: Array[String]): Unit = {
    val (spark, sfDir) = BenchHarness.session()
    def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
      ColumnBridge.column(e)
    def x(col: Column) = ColumnBridge.expression(col)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks")).persist()
    docs.count()
    val sh = docs.select(col("doc_id"), c(WordNgrams(x(col("toks")), 3)).as("sh")).persist()
    sh.count()

    def time3(mk: () => Any): Double = BenchHarness.medianOf(mk)
    val ngrams = time3(() => docs
      .select(size(c(WordNgrams(x(col("toks")), 3))).as("n"))
      .agg(sum(col("n"))).head())
    val minhash = time3(() => sh
      .select(element_at(c(MinHashSig(x(col("sh")))), 1).as("m"))
      .agg(sum(col("m"))).head())
    val simhash = time3(() => sh
      .select(element_at(c(SimHashVec(x(col("sh")))), 1).as("v"))
      .agg(sum(col("v"))).head())
    val tokcnt = time3(() => docs
      .select(size(c(TokenCounts(x(col("toks"))))).as("n"))
      .agg(sum(col("n"))).head())
    // the REAL pipeline shape: text → split → lower → WordNgrams →
    // MinHashSig fused in one projection (under CodegenFallback the child
    // chain evaluates interpreted; under doGenCode it all codegens)
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).persist()
    raw.count()
    val chain = time3(() => raw
      .select(element_at(
        c(MinHashSig(x(c(WordNgrams(x(split(lower(col("text")), " ")), 3))))), 1).as("m"))
      .agg(sum(col("m"))).head())
    println(s"""{"metric":"sig_kernels","ngrams_sec":$ngrams,"minhash_sec":$minhash,"simhash_sec":$simhash,"tokencounts_sec":$tokcnt,"chain_sec":$chain,"sf":"$sfDir"}""")
    spark.stop()
  }
}
