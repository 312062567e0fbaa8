package graft.functions

import graft.{GraftOps, Tables}
import org.apache.spark.sql.functions._

/** A/B: the declared sorted-neighborhood JW verify with and without the
  * [[graft.plans.JaroWinklerPrefilter]] optimizer rule. Interleaved per
  * the BenchHarness discipline; the rule is swapped via the mutable
  * `spark.experimental.extraOptimizations` seq between runs (plans are
  * rebuilt per run, so each run re-optimizes under the active rule set).
  */
object JwPrefilterAbBench {
  def main(args: Array[String]): Unit = {
    val (spark, sfDir) = BenchHarness.session()

    def run(): Long = {
      val names = Tables(spark, sfDir, "part")
        .withColumn("val",
          when(col("p_partkey") % 5 === 0,
            col("p_name").substr(lit(1), length(col("p_name")) - 1))
            .otherwise(col("p_name")))
        .select(col("val")).distinct()
      val sim = GraftOps.jaroWinkler(col("val_a"), col("val_b"))
      GraftOps.sortedNeighborhoodPairs(names, "val", 5)
        .where(sim >= 0.9)
        .count()
    }

    def withoutRule(): Any = {
      spark.experimental.extraOptimizations = Nil
      run()
    }
    def withRule(): Any = {
      spark.experimental.extraOptimizations = Seq(graft.plans.JaroWinklerPrefilter)
      run()
    }

    val (a, b) = BenchHarness.abMedians(withoutRule _, withRule _, rounds = 5)

    // second shape: KERNEL-BOUND — hundreds of thousands of blocked
    // pairs over LENGTH-DIVERSE strings (document prefixes, 1..120
    // chars). This is the regime the guard exists for: most pairs
    // differ enough in length that the O(1) check retires them before
    // the O(len²) kernel runs. (The SNM shape above is join-bound — n·w
    // pairs — so it measures the rule's overhead, not its win.)
    def runDiverse(): Long = {
      val names = Tables(spark, sfDir, "documents")
        .select(col("doc_id"),
          substring(col("text"), lit(1),
            (col("doc_id") % 120 + 1).cast("int")).as("val"))
        .withColumn("blk", col("doc_id") % 20)
      val a = names.select(col("blk"), col("val").as("val_a"))
      val b = names.select(col("blk"), col("val").as("val_b"))
      a.join(b, "blk")
        .where(col("val_a") < col("val_b") &&
          GraftOps.jaroWinkler(col("val_a"), col("val_b")) >= 0.9)
        .count()
    }
    def diversePlain(): Any = {
      spark.experimental.extraOptimizations = Nil
      runDiverse()
    }
    def diverseRule(): Any = {
      spark.experimental.extraOptimizations = Seq(graft.plans.JaroWinklerPrefilter)
      runDiverse()
    }
    val (c, d) = BenchHarness.abMedians(diversePlain _, diverseRule _, rounds = 5)

    println(s"""{"metric":"jw_prefilter_ab","homogeneous_plain_s":$a,"homogeneous_rule_s":$b,"homogeneous_ratio":${b / a},"diverse_plain_s":$c,"diverse_rule_s":$d,"diverse_ratio":${d / c}}""")
    spark.stop()
  }
}
