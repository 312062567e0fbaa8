package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Source/sink coverage beyond parquet (reference loads CSVs via pandas,
  * SURVEY.md §2.1): CSV and JSON round-trips with schema inference, plus a
  * bucketed-table join that must be shuffle-free — the co-located-join
  * story that matters at 100 TB (bucket both fact tables on the join key
  * at ingest; joins then need no exchange at all).
  */
class SourcesSpec extends SparkSuite {

  private lazy val tmp = Files.createTempDirectory("graft-sources").toString

  /** Files.list with the underlying DirectoryStream CLOSED (the raw
    * stream leaks a directory fd until GC). */
  private def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = Files.list(p)
    try { import scala.jdk.CollectionConverters._; s.iterator().asScala.toSeq }
    finally s.close()
  }

  test("CSV round-trip with header + inferSchema") {
    val df = Tables(spark, sf, "nation")
    df.write.mode("overwrite").option("header", "true").csv(s"$tmp/nation_csv")
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$tmp/nation_csv")
    assert(back.count() == df.count())
    assert(back.columns.toSet == df.columns.toSet)
    assert(back.agg(sum("n_nationkey")).head().getLong(0) ==
      df.agg(sum("n_nationkey")).head().getLong(0))
  }

  test("ORC round-trip") {
    val df = Tables(spark, sf, "supplier")
    df.write.mode("overwrite").orc(s"$tmp/supplier_orc")
    val back = spark.read.orc(s"$tmp/supplier_orc")
    assert(back.count() == df.count())
    assert(back.schema == df.schema)
  }

  test("JSON lines round-trip") {
    val df = Tables(spark, sf, "region")
    df.write.mode("overwrite").json(s"$tmp/region_json")
    val back = spark.read.json(s"$tmp/region_json")
    assert(back.count() == df.count())
    assert(back.select("r_name").distinct().count() ==
      df.select("r_name").distinct().count())
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // a previous JVM's orphaned managed-table location blocks CREATE
    Seq("li_b", "ord_b").foreach { t =>
      val p = Paths.get("spark-warehouse", t)
      if (Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
    }
    Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
      .write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_b")
    Tables(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_b")
    // force a non-broadcast join so the bucket layout is what saves the
    // shuffle (at 100 TB neither side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // co-located buckets: SortMergeJoin with NO shuffle on either side
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
      assert(plan.contains("Bucketed: true"), plan.take(1500))
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed layout is published once: a fresh catalog re-registers, never rewrites") {
    // The driver benches in a fresh JVM whose in-memory catalog is empty;
    // the one-time layout cost must NOT be re-paid there. Simulate the
    // fresh session by dropping the catalog entries (external tables —
    // files stay) and prove the second run (a) re-registers over the same
    // files (mtimes untouched), (b) returns identical rows, (c) still
    // joins exchange-free.
    val q = SparkEntry.queries("join_bucketed_colocated")
    val r1 = q(spark, sf).collect().map(_.toString).toSeq
    val tag = sf.replaceAll("[^A-Za-z0-9]", "_")
    val stable = Paths.get(
      s"target/graft_scratch/stable_bucketed_${sf.replaceAll("[^A-Za-z0-9.]", "_")}")
    assert(Files.exists(stable), s"stable layout dir missing: $stable")
    import scala.jdk.CollectionConverters._
    def mtimes = Files.walk(stable).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis).toMap
    val before = mtimes
    assert(before.nonEmpty, "no bucketed part files under the stable path")
    spark.sql(s"DROP TABLE li_bkt_$tag")
    spark.sql(s"DROP TABLE ord_bkt_$tag")
    val df2 = q(spark, sf)
    assert(df2.collect().map(_.toString).toSeq == r1)
    assert(mtimes == before, "fresh-catalog run rewrote the bucketed layout")
    // post-action the adaptive plan string repeats every exchange in its
    // "== Initial Plan ==" section — count only the executed final section
    val plan = df2.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1,
      s"re-registered bucketed join shuffled its inputs:\n${plan.take(2000)}")
    assert(plan.contains("Bucketed: true"), "scan lost its bucket metadata")
  }

  test("bucketed layout self-heals a crashed partial publish (stable dir without _SUCCESS)") {
    // A writer that died mid-publish leaves a stable dir WITHOUT _SUCCESS;
    // the rename of the next builder then fails (target exists). The
    // publish must clear the stale dir and retry — not degrade every
    // future session to per-pid rebuilds with an unrepaired stable path.
    val q = SparkEntry.queries("join_bucketed_colocated")
    val r1 = q(spark, sf).collect().map(_.toString).toSeq
    val tag = sf.replaceAll("[^A-Za-z0-9]", "_")
    val stable = Paths.get(
      s"target/graft_scratch/stable_bucketed_${sf.replaceAll("[^A-Za-z0-9.]", "_")}")
    // dirs are ${table}_b${nBuckets}_$fingerprint — regenerated testdata
    // can leave stale-fingerprint siblings that the current run will
    // never republish, so corrupt and assert ONLY the current tables'
    // dirs (by name prefix; the re-run republishes the live fingerprint)
    val prefixes = Seq(s"li_bkt_${tag}_b", s"ord_bkt_${tag}_b")
    def tableDirs = listDir(stable)
      .filter(d => Files.isDirectory(d) &&
        prefixes.exists(d.getFileName.toString.startsWith))
    assert(tableDirs.nonEmpty, s"no published table dirs under $stable")
    tableDirs.foreach(d => Files.deleteIfExists(d.resolve("_SUCCESS")))
    spark.sql(s"DROP TABLE IF EXISTS li_bkt_$tag")
    spark.sql(s"DROP TABLE IF EXISTS ord_bkt_$tag")
    assert(q(spark, sf).collect().map(_.toString).toSeq == r1)
    prefixes.foreach { p =>
      assert(tableDirs.exists(d => d.getFileName.toString.startsWith(p) &&
          Files.exists(d.resolve("_SUCCESS"))),
        s"no healed re-published layout for $p under $stable")
    }
  }

  test("heal lock: a live lock blocks healing without failing queries; a stale lock expires") {
    val q = SparkEntry.queries("join_bucketed_colocated")
    val r1 = q(spark, sf).collect().map(_.toString).toSeq
    val tag = sf.replaceAll("[^A-Za-z0-9]", "_")
    val stable = Paths.get(
      s"target/graft_scratch/stable_bucketed_${sf.replaceAll("[^A-Za-z0-9.]", "_")}")
    val prefixes = Seq(s"li_bkt_${tag}_b", s"ord_bkt_${tag}_b")
    val tableDirs = listDir(stable)
      .filter(d => Files.isDirectory(d) &&
        prefixes.exists(d.getFileName.toString.startsWith) &&
        !d.getFileName.toString.contains(".heal_lock") &&
        !d.getFileName.toString.contains(".stale_"))
    assert(tableDirs.nonEmpty)
    // crashed publish + a LIVE lock held by "another" healer
    tableDirs.foreach(d => Files.deleteIfExists(d.resolve("_SUCCESS")))
    val locks = tableDirs.map(d =>
      d.resolveSibling(d.getFileName.toString + ".heal_lock"))
    locks.foreach(Files.createDirectories(_))
    def dropTables(): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS li_bkt_$tag")
      spark.sql(s"DROP TABLE IF EXISTS ord_bkt_$tag")
    }
    dropTables()
    // blocked from healing, the query must still answer — served from the
    // pid-local build dir — and must NOT have touched the stable path
    assert(q(spark, sf).collect().map(_.toString).toSeq == r1)
    assert(tableDirs.forall(d => !Files.exists(d.resolve("_SUCCESS"))),
      "a process that lost the heal lock republished anyway")
    // age the locks past the 10-min TTL: the next fresh-catalog run must
    // expire them, heal, and release its own lock
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 11 * 60 * 1000)
    locks.foreach(l => Files.setLastModifiedTime(l, old))
    dropTables()
    assert(q(spark, sf).collect().map(_.toString).toSeq == r1)
    prefixes.foreach { p =>
      assert(tableDirs.exists(d => d.getFileName.toString.startsWith(p) &&
          Files.exists(d.resolve("_SUCCESS"))),
        s"stale lock not expired / layout not healed for $p")
    }
    assert(locks.forall(l => !Files.exists(l)), "healer leaked its lock")
  }

  test("layout_compact_small_files actually compacts 64 shards into 2 files") {
    // run the declared query (it writes both layouts as a side effect),
    // then count the parquet parts each layout holds
    SparkEntry.queries("layout_compact_small_files")(spark, sf).collect()
    val root = Paths.get(Tables.scratchDir("sources", sf))
    def parts(d: String) = listDir(root.resolve(d))
      .count(_.getFileName.toString.endsWith(".parquet"))
    assert(parts("events_fragmented") == 64,
      "fragmented layout should have 64 shards")
    assert(parts("events_compacted") == 2,
      "compaction should produce exactly 2 files")
  }

  test("source_merge_schema backfills the late column with nulls, not failures") {
    val row = SparkEntry.queries("source_merge_schema")(spark, sf).head()
    val nRows = row.getAs[Long]("n_rows")
    val nWith = row.getAs[Long]("n_with_discount")
    assert(nRows > 0 && nWith > 0 && nWith < nRows,
      s"expected a mix of pre- and post-evolution rows, got n=$nRows with=$nWith")
  }
}
