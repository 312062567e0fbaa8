package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Duplication-mass probe for the substring-dedup family (VERDICT r11
  * item 5). The 10x/100x probes grow the CORPUS but keep the planted
  * duplication factor constant by construction, so their near-zero
  * exponents for text_substr_dedup / text_substr_dup_profile /
  * pipeline_text_cleaning_funnel prove corpus-linearity but say nothing
  * about how cost responds to the DUPLICATION axis — the axis a real
  * boilerplate-heavy crawl stresses. This probe holds the corpus FIXED
  * (sf0.1 documents) and sweeps planted dup mass m in {0, 2, 8, 32}:
  * variant m appends one of four 24-word boilerplate spans to every doc
  * with doc_id % 10 == 1 and (doc_id DIV 10) % 32 < m — so the number
  * of span-sharing documents (and with it the duplicated token mass and
  * the gram-group sizes inside the dedup window) scales 1:4:16 across
  * the non-zero variants while total corpus size stays ~constant
  * (the added boilerplate IS the dup-mass axis).
  *
  * Injection strength is deliberate: the sf0.1 documents table is 5000
  * docs x ~54 words (270k tokens), so a measurable sweep needs the
  * planted mass to DOMINATE — variant m appends a 48-word span to
  * m/32 of ALL docs (m=32: +89% tokens, every one of them inside a
  * ~1250-document duplicate group; a first cut with 24 words on 10% of
  * docs moved < 1% of tokens and read pure noise). Group sizes scale
  * 1:4:16 with m, so anything quadratic IN THE GROUP (a pair join
  * inside a duplicate group, a group-sized window blowup) reads as
  * mass_exponent >= ~2 over the 16x mass span.
  *
  * Contract: for each probed query, (t(m) − t(0)) must grow at most
  * ~linearly in m — the per-mass exponent log(Δt32/Δt2)/log(16) stays
  * ≤ ~1. A quadratic-in-group-size regression would read ≥ 2.
  *
  * Usage: runMain graft.DupProbe [baseDir] — writes SCALE_PROBE_DUP.json.
  */
object DupProbe {

  private val masses = Seq(0, 2, 8, 32)
  private val queriesToProbe = Seq(
    "text_substr_dedup", "text_substr_dup_profile",
    "pipeline_text_cleaning_funnel", "dedup_substr_recall_eval")

  def buildVariant(spark: SparkSession, base: String, out: String, m: Int): Unit = {
    val marker = new java.io.File(s"$out/_GRAFT_DUP_OK")
    if (marker.exists()) return
    System.err.println(s"[dup-probe] building m=$m variant at $out ...")
    val docs = spark.read.parquet(s"$base/documents.parquet")
    // four distinct 48-word boilerplate spans — long enough that every
    // probed kernel (minWords 8..20) sees them, heavy enough that the
    // planted mass dominates the sweep (see scaladoc)
    val spanFor = (g: Int) =>
      (1 to 48).map(i => s"boiler${g}w$i").mkString(" ")
    val withDup = docs.withColumn("text",
      when(col("doc_id") % 32 < m,
        concat_ws(" ", col("text"),
          element_at(array((0 until 4).map(g => lit(spanFor(g))): _*),
            (col("doc_id") % 4 + 1).cast("int"))))
        .otherwise(col("text")))
    withDup.write.mode("overwrite").parquet(s"$out/documents.parquet")
    // the probed queries read only `documents`, but Tables() resolution
    // of other names must not break if a query evolves — link the rest
    val src = new java.io.File(base)
    src.listFiles().filter(f => f.getName.endsWith(".parquet") &&
      f.getName != "documents.parquet").foreach { f =>
      val dst = java.nio.file.Paths.get(out, f.getName)
      if (!dst.toFile.exists())
        java.nio.file.Files.createSymbolicLink(dst, f.toPath.toAbsolutePath)
    }
    java.nio.file.Files.write(marker.toPath, s"m=$m base=$base".getBytes("UTF-8"))
  }

  private def num(d: Double): String =
    if (d.isNaN || d.isInfinite) "null"
    else (math.round(d * 1000) / 1000.0).toString

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val runs = sys.env.getOrElse("SPARK_GRAFT_DUP_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = masses.map { m =>
      val out = s"/tmp/graft_dup_m$m"
      new java.io.File(out).mkdirs()
      buildVariant(spark, base, out, m)
      m -> out
    }
    // per (query, mass): median over `runs` INTERLEAVED cycles — a fixed
    // m=0-first order hands later variants free JIT/page-cache warmth
    // (the BenchHarness A/B lesson; a sequential first cut measured
    // m=32 FASTER than m=0 purely from session warming)
    val rows = queriesToProbe.flatMap { q =>
      val fn = SparkEntry.queries(q)
      dirs.foreach { case (_, dir) => fn(spark, dir).count() } // warmup pass
      val samples = (1 to runs).flatMap { _ =>
        dirs.map { case (m, dir) =>
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          m -> (System.nanoTime() - t0) / 1e9
        }
      }
      dirs.map { case (m, _) =>
        val ts = samples.collect { case (`m`, t) => t }.sorted
        val med = ts(ts.size / 2)
        System.err.println(s"[dup-probe] $q m=$m ${num(med)}s")
        (q, m, med)
      }
    }
    val byQ = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (q, rs) =>
      val t = rs.map(r => r._2 -> r._3).toMap
      val d2 = t(2) - t(0)
      val d32 = t(32) - t(0)
      // per-mass exponent over the 16x mass ratio; guard tiny deltas
      // (overhead-dominated — report null rather than noise)
      val exp =
        if (d2 > 0.05 && d32 > 0) math.log(d32 / d2) / math.log(16.0)
        else Double.NaN
      s"""{"query":"$q","t_m0":${num(t(0))},"t_m2":${num(t(2))},""" +
        s""""t_m8":${num(t(8))},"t_m32":${num(t(32))},""" +
        s""""delta_m2":${num(d2)},"delta_m32":${num(d32)},""" +
        s""""mass_exponent":${num(exp)}}"""
    }
    val out = s"""{"base_dir":"$base","masses":[0,2,8,32],"runs":$runs,""" +
      s""""results":[${byQ.mkString(",")}],""" +
      """"contract":"delta-cost grows <= ~linearly in planted dup mass (mass_exponent <= ~1 over the 16x span); corpus size fixed"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("SCALE_PROBE_DUP.json"), out.getBytes("UTF-8"))
    println(out)
    spark.stop()
  }
}
