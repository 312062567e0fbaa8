package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2): each entry
  * builds a lazy DataFrame plan from parquet under the given sf dir.
  * `oracleSql` carries the DuckDB-equivalent SQL for the hash-match gate.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (ops.Scans.queries, ops.Scans.oracle),
    (ops.Filters.queries, ops.Filters.oracle),
    (ops.Joins.queries, ops.Joins.oracle),
    (ops.Aggregates.queries, ops.Aggregates.oracle),
    (ops.Windows.queries, ops.Windows.oracle),
    (ops.SortSet.queries, ops.SortSet.oracle),
    (ops.ScalarFns.queries, ops.ScalarFns.oracle),
    (ops.Reshape.queries, ops.Reshape.oracle),
    (ops.Extras.queries, ops.Extras.oracle),
    (ops.Extras2.queries, ops.Extras2.oracle),
    (ops.Extras3.queries, ops.Extras3.oracle),
    (ops.Extras4.queries, ops.Extras4.oracle),
    (ops.Extras5.queries, ops.Extras5.oracle),
    (ops.Extras6.queries, ops.Extras6.oracle),
    (ops.Extras7.queries, ops.Extras7.oracle),
    (ops.Graph.queries, ops.Graph.oracle),
    (ops.IntervalJoin.queries, ops.IntervalJoin.oracle),
    (ops.Drift.queries, ops.Drift.oracle),
    (ops.Stats.queries, ops.Stats.oracle),
    (ops.Extras8.queries, ops.Extras8.oracle),
    (ops.Extras9.queries, ops.Extras9.oracle),
    (ops.Extras10.queries, ops.Extras10.oracle),
    (ops.Extras11.queries, ops.Extras11.oracle),
    (ops.Extras12.queries, ops.Extras12.oracle),
    (ops.Extras13.queries, ops.Extras13.oracle),
    (ops.Extras14.queries, ops.Extras14.oracle),
    (ops.Extras15.queries, ops.Extras15.oracle),
    (ops.Extras16.queries, ops.Extras16.oracle),
    (ops.Extras17.queries, ops.Extras17.oracle),
    (ops.Extras18.queries, ops.Extras18.oracle),
    (ops.Extras19.queries, ops.Extras19.oracle),
    (ops.Extras20.queries, ops.Extras20.oracle),
    (ops.Extras21.queries, ops.Extras21.oracle),
    (ops.Extras22.queries, ops.Extras22.oracle),
    (ops.Extras23.queries, ops.Extras23.oracle),
    (ops.Extras24.queries, ops.Extras24.oracle),
    (ops.Extras25.queries, ops.Extras25.oracle),
    (ops.Extras26.queries, ops.Extras26.oracle),
    (ops.Extras27.queries, ops.Extras27.oracle),
    (ops.Extras28.queries, ops.Extras28.oracle),
    (ops.Extras29.queries, ops.Extras29.oracle),
    (ops.Extras30.queries, ops.Extras30.oracle),
    (ops.Extras31.queries, ops.Extras31.oracle),
    (ops.Extras32.queries, ops.Extras32.oracle),
    (ops.Extras33.queries, ops.Extras33.oracle),
    (ops.Extras34.queries, ops.Extras34.oracle),
    (ops.Extras35.queries, ops.Extras35.oracle),
    (ops.Extras36.queries, ops.Extras36.oracle),
    (ops.Extras37.queries, ops.Extras37.oracle),
    (ops.Extras38.queries, ops.Extras38.oracle),
    (ops.Extras39.queries, ops.Extras39.oracle),
    (ops.Extras40.queries, ops.Extras40.oracle),
    (ops.Extras41.queries, ops.Extras41.oracle),
    (ops.Extras42.queries, ops.Extras42.oracle),
    (ops.Extras43.queries, ops.Extras43.oracle),
    (ops.Extras44.queries, ops.Extras44.oracle),
    (ops.Extras45.queries, ops.Extras45.oracle),
    (ops.Extras46.queries, ops.Extras46.oracle),
    (clean.Profile2.queries, clean.Profile2.oracle),
    (ops.Analytics.queries, ops.Analytics.oracle),
    (ops.Analytics2.queries, ops.Analytics2.oracle),
    (llm.Mix.queries, llm.Mix.oracle),
    (llm.Dedup2.queries, llm.Dedup2.oracle),
    (llm.LineDedup.queries, llm.LineDedup.oracle),
    (llm.SubstrDedup.queries, llm.SubstrDedup.oracle),
    (llm.Funnel.queries, llm.Funnel.oracle),
    (llm.Curriculum.queries, llm.Curriculum.oracle),
    (sources.Sources.queries, sources.Sources.oracle),
    (clean.ProfileQueries.queries, clean.ProfileQueries.oracle),
    (clean.Missing.queries, clean.Missing.oracle),
    (clean.Outliers.queries, clean.Outliers.oracle),
    (clean.StringClean.queries, clean.StringClean.oracle),
    (clean.Validate.queries, clean.Validate.oracle),
    (clean.RecipeQueries.queries, clean.RecipeQueries.oracle),
    (clean.Encode.queries, clean.Encode.oracle),
    (llm.Text.queries, llm.Text.oracle),
    (llm.Retrieval.queries, llm.Retrieval.oracle),
    (llm.Dedup.queries, llm.Dedup.oracle),
    (llm.Similarity.queries, llm.Similarity.oracle),
    (llm.Multimodal.queries, llm.Multimodal.oracle),
    (llm.Pipeline.queries, llm.Pipeline.oracle),
    (llm.Curation.queries, llm.Curation.oracle),
    (llm.Chunking.queries, llm.Chunking.oracle),
    (streaming.StreamQueries.queries, streaming.StreamQueries.oracle)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_groupby_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    merged(modules.map(_._1), "queries")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    merged(modules.map(_._2), "oracleSql")

  // ++ would silently keep only the LAST definition of a duplicated key,
  // shrinking the declared inventory with zero signal — fail loudly
  private def merged[V](maps: Seq[Map[String, V]], what: String): Map[String, V] = {
    val m = maps.reduce(_ ++ _)
    require(m.size == maps.map(_.size).sum, {
      val dups = maps.flatMap(_.keys).groupBy(identity)
        .collect { case (k, vs) if vs.size > 1 => k }
      s"duplicate $what keys across modules: ${dups.mkString(", ")}"
    })
    m
  }
}
