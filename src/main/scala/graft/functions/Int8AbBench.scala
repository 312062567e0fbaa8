package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** A/B micro-bench for the quantized ranking stage: the int8-as-double
  * `q` ranked with the codegen [[DotProduct]] vs the TRUE int8 binary
  * `q8` ranked with [[Int8Dot]]. The structural claim is FOOTPRINT (8×
  * fewer candidate bytes through shuffle/cache — decisive at 100 TB);
  * this measures whether the byte loop also buys per-row time on a
  * self-join-shaped candidate ranking at local scale. Median of 3,
  * untimed warmup. Run ad hoc:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.functions.Int8AbBench"
  */
object Int8AbBench {
  def main(args: Array[String]): Unit = {
    val (spark, sfDir) = BenchHarness.session()
    def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
      ColumnBridge.column(e)
    def x(col: Column) = ColumnBridge.expression(col)

    val base = graft.llm.Curation.withInt8Packed(
      graft.llm.Similarity.withUnit(
        spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding")),
        col("embedding")))
    // label-blocked candidate pairs (the declared kNN blocking shape):
    // both payload forms ride the SAME pair relation, so the A/B isolates
    // the dot kernel + payload width, not the join
    val pairs = base
      .withColumn("blk", pmod(col("vec_id"), lit(50)))
      .select(col("blk"), col("vec_id"), col("q"), col("q8"))
    val a = pairs.select(col("blk"), col("vec_id").as("ida"),
      col("q").as("qa"), col("q8").as("q8a"))
    val b = pairs.select(col("blk"), col("vec_id").as("idb"),
      col("q").as("qb"), col("q8").as("q8b"))
    val joined = a.join(b, Seq("blk")).where(col("ida") < col("idb")).persist()
    joined.count()

    // interleaved so neither form inherits the other's JIT/cache warmth
    val (doubleDot, byteDot) = BenchHarness.abMedians(
      () => joined
        .select(c(DotProduct(x(col("qa")), x(col("qb")))).as("d"))
        .agg(sum(col("d"))).head(),
      () => joined
        .select(c(Int8Dot(x(col("q8a")), x(col("q8b")))).as("d"))
        .agg(sum(col("d"))).head())
    // payload width actually shipped per candidate vector (the 100 TB lever)
    val w = joined.limit(1)
      .select(size(col("qa")).as("dims"), octet_length(col("q8a")).as("q8_bytes"))
      .head()
    val qBytes = w.getInt(0) * 8
    println(s"""{"metric":"int8_ab","double_dot_sec":$doubleDot,"byte_dot_sec":$byteDot,"q_bytes_per_vec":$qBytes,"q8_bytes_per_vec":${w.getInt(1)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
