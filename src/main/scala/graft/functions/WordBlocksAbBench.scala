package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Interleaved A/B micro-bench (NOT a declared query): the native codegen
  * [[WordBlocks]] block splitter vs the composable
  * transform(sequence(…), i → array_join(slice(…))) HOF chain it replaced
  * in [[graft.llm.LineDedup]] — same output (Round8Spec pins
  * byte-equality), so the delta is pure per-row interpretation overhead
  * (three lambdas per block; HOFs are CodegenFallback).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.functions.WordBlocksAbBench"
  */
object WordBlocksAbBench {
  def main(args: Array[String]): Unit = {
    val (spark, sfDir) = BenchHarness.session()
    val bw = 8
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).persist()
    docs.count()

    val words = split(col("text"), " ")
    val native: Column = ColumnBridge.column(
      WordBlocks(ColumnBridge.expression(words), bw))
    val nBlocks = ((size(words) + lit(bw - 1)) / lit(bw)).cast("int")
    val hof: Column = transform(sequence(lit(0), nBlocks - 1),
      i => array_join(slice(words, i * bw + 1, lit(bw)), " "))

    // drain through a cheap aggregate so the block arrays are fully
    // materialized but nothing wide shuffles
    def drain(c: Column) =
      docs.select(explode(c).as("b")).agg(sum(length(col("b")))).head()

    val (tNative, tHof) = BenchHarness.abMedians(
      () => drain(native), () => drain(hof), rounds = 5)
    println(f"native=${tNative}%.3fs hof=${tHof}%.3fs ratio=${tNative / tHof}%.2f")
    docs.unpersist()
    spark.stop()
  }
}
