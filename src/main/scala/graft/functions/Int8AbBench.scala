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
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
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

    def time3(mk: () => Any): Double = {
      mk()
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mk(); (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
    }
    val doubleDot = time3(() => joined
      .select(c(DotProduct(x(col("qa")), x(col("qb")))).as("d"))
      .agg(sum(col("d"))).head())
    val byteDot = time3(() => joined
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
