package graft.functions

import org.apache.spark.sql.SparkSession

/** Shared harness for the ad-hoc kernel micro-benches (SigBench,
  * FingerprintAbBench, Int8AbBench): ONE definition of the session
  * bootstrap and the timing methodology, so a fix to either applies to
  * every bench instead of drifting across copies.
  *
  * A/B comparisons run INTERLEAVED (warm both, then A,B,A,B,A,B): with a
  * fixed order the second form inherits the first's JIT/page-cache/
  * columnar-decode warmth and measures faster for free — the earlier
  * fixed-order runs credited the second-measured form with part of that
  * artifact. Medians per form are taken across the interleaved runs.
  */
object BenchHarness {

  /** (session, sfDir) from the standard SPARK_GRAFT_* env knobs. */
  def session(): (SparkSession, String) = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (spark, sfDir)
  }

  private def once(mk: () => Any): Double = {
    val t0 = System.nanoTime(); mk(); (System.nanoTime() - t0) / 1e9
  }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  /** median of `runs` timed executions after one untimed warmup. */
  def medianOf(mk: () => Any, runs: Int = 3): Double = {
    mk()
    median((1 to runs).map(_ => once(mk)))
  }

  /** interleaved A/B: warm both, then alternate A,B per round; returns
    * (medianA, medianB). */
  def abMedians(a: () => Any, b: () => Any, rounds: Int = 3): (Double, Double) = {
    a(); b()
    val (ta, tb) = (1 to rounds).map(_ => (once(a), once(b))).unzip
    (median(ta), median(tb))
  }
}
