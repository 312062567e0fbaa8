package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-10 batch 4: vocabulary coverage curve (tokenizer design input),
  * burst-rate bot detection (training-data hygiene on event streams),
  * prefix-duplication rate (boilerplate detector), and the RecodeValues
  * CleanOp's declared query.
  */
object Extras32 {

  val queries: Map[String, Q] = Map(
    // vocabulary coverage curve: how many distinct words cover 50 / 90 /
    // 99% of total token mass — the Zipf-head compactness number a
    // tokenizer budget is designed around. Word frequencies reduce
    // map-side; the cumulative mass rides the distributed prefix sum
    // over ONE encoded (freq DESC, word ASC) sort key (zero-padded
    // inverted count ‖ word — a total order, so the exclusive cumsum is
    // deterministic; within an equal-freq run the ANSWER is tie-order
    // invariant because the count of exclusive-cum values under the
    // threshold only depends on the run's multiset). Counts compare
    // against ⌈pct·total⌉ — integer thresholds, no float surface.
    "text_vocab_coverage_curve" -> { (s, dir) =>
      val words = Tables(s, dir, "documents")
        .select(explode(split(lower(col("text")), " ")).as("w"))
        .where(col("w") =!= "")
        .groupBy("w").agg(count(lit(1)).as("freq"))
      val keyed = words.select(lit(0L).as("__p"),
        concat(lpad((lit(Long.MaxValue) - col("freq")).cast("string"), 19, "0"),
          lit("|"), col("w")).as("ord"),
        col("freq"))
      val cum = GraftOps.distributedRunningSum(keyed, "__p", "ord", "freq",
        "cum", exclusive = true)
      val tot = words.agg(sum(col("freq")).as("total"),
        count(lit(1)).as("n_vocab"))
      cum.crossJoin(broadcast(tot))
        .agg(max(col("n_vocab")).as("n_vocab"), max(col("total")).as("total_tokens"),
          sum(when(col("cum") < ceil(lit(0.5) * col("total")), 1L)
            .otherwise(0L)).as("words_for_50pct"),
          sum(when(col("cum") < ceil(lit(0.9) * col("total")), 1L)
            .otherwise(0L)).as("words_for_90pct"),
          sum(when(col("cum") < ceil(lit(0.99) * col("total")), 1L)
            .otherwise(0L)).as("words_for_99pct"))
    },

    // burst-rate bot detection over the event stream — the hygiene gate
    // a behavioral-training pipeline runs before user events become
    // features: users whose peak per-minute event rate exceeds the
    // corpus's organic ceiling (≥ 2 here — the generator's natural
    // per-user-minute maximum is 2, so the cut flags exactly the
    // concurrent-fire profile; production pipelines raise the literal).
    // Two hash aggregates (user-minute grain, then user grain) with
    // map-side combine; integer-only; top-25 via TakeOrdered.
    "events_bot_detection" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(col("user_id"),
        expr("unix_micros(ts) DIV 60000000").as("minute"))
      val perMin = e.groupBy("user_id", "minute")
        .agg(count(lit(1)).as("c"))
      perMin.groupBy("user_id")
        .agg(sum(col("c")).as("n_events"),
          count(lit(1)).as("n_active_minutes"),
          max(col("c")).as("max_per_min"))
        .where(col("max_per_min") >= 2L)
        .orderBy(col("max_per_min").desc, col("user_id"))
        .limit(25)
    },

    // prefix-duplication rate per source: documents sharing an identical
    // 64-char lowercase prefix with ≥ 1 other doc — the cheap
    // boilerplate/template detector that runs BEFORE expensive MinHash
    // (a shared prefix is how scraped templates usually announce
    // themselves). One shuffle on (source, prefix); integer counts, one
    // division at emit.
    "text_prefix_dup_rate" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .select(col("source"),
          substring(lower(col("text")), 1, 64).as("prefix"))
      val groups = d.groupBy("source", "prefix")
        .agg(count(lit(1)).as("c"))
      groups.groupBy("source")
        .agg(sum(col("c")).as("n_docs"),
          sum(when(col("c") > 1L, col("c")).otherwise(0L)).as("n_prefix_dup"),
          count(lit(1)).as("n_prefixes"))
        .select(col("source"), col("n_docs"), col("n_prefix_dup"),
          col("n_prefixes"),
          round(col("n_prefix_dup").cast(DoubleType) /
            col("n_docs").cast(DoubleType), 6).as("dup_rate"))
        .orderBy("source")
    },

    // the RecodeValues CleanOp as a declared query: harmonize event-type
    // spellings ('view'→'pageview', 'click'→'tap'), then the recoded
    // census — pins the dictionary-recode semantics (mapped values
    // rewrite, unmapped and NULL pass through) against the oracle.
    "clean_recode_values" -> { (s, dir) =>
      val recoded = graft.clean.RecodeValues("event_type",
        Seq("view", "click"), Seq("pageview", "tap"))(
        Tables(s, dir, "events").select(col("event_id"), col("event_type")))
      recoded.groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }
  )

  val oracle: Map[String, String] = Map(
    "text_vocab_coverage_curve" ->
      """WITH w AS (SELECT word, cast(count(*) AS bigint) AS freq FROM (
        |    SELECT unnest(string_split(lower(text), ' ')) AS word
        |    FROM documents) WHERE word <> '' GROUP BY word),
        |c AS (SELECT freq,
        |    sum(freq) OVER (ORDER BY freq DESC, word) - freq AS cum
        |  FROM w),
        |tot AS (SELECT cast(sum(freq) AS bigint) AS total,
        |    cast(count(*) AS bigint) AS n_vocab FROM w)
        |SELECT max(n_vocab) AS n_vocab, max(total) AS total_tokens,
        |  cast(sum(CASE WHEN cum < ceil(0.5 * total) THEN 1 ELSE 0 END)
        |    AS bigint) AS words_for_50pct,
        |  cast(sum(CASE WHEN cum < ceil(0.9 * total) THEN 1 ELSE 0 END)
        |    AS bigint) AS words_for_90pct,
        |  cast(sum(CASE WHEN cum < ceil(0.99 * total) THEN 1 ELSE 0 END)
        |    AS bigint) AS words_for_99pct
        |FROM c CROSS JOIN tot""".stripMargin,
    "events_bot_detection" ->
      """WITH m AS (SELECT user_id,
        |    epoch_us(ts) // 60000000 AS minute,
        |    cast(count(*) AS bigint) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, cast(sum(c) AS bigint) AS n_events,
        |  cast(count(*) AS bigint) AS n_active_minutes,
        |  cast(max(c) AS bigint) AS max_per_min
        |FROM m GROUP BY user_id
        |HAVING max(c) >= 2
        |ORDER BY max_per_min DESC, user_id LIMIT 25""".stripMargin,
    "text_prefix_dup_rate" ->
      """WITH d AS (SELECT source,
        |    substring(lower(text), 1, 64) AS prefix FROM documents),
        |g AS (SELECT source, prefix, cast(count(*) AS bigint) AS c
        |  FROM d GROUP BY 1, 2)
        |SELECT source, cast(sum(c) AS bigint) AS n_docs,
        |  cast(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS bigint)
        |    AS n_prefix_dup,
        |  cast(count(*) AS bigint) AS n_prefixes,
        |  round(cast(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS double)
        |    / cast(sum(c) AS double), 6) AS dup_rate
        |FROM g GROUP BY source ORDER BY source""".stripMargin,
    "clean_recode_values" ->
      """SELECT CASE WHEN event_type = 'view' THEN 'pageview'
        |            WHEN event_type = 'click' THEN 'tap'
        |            ELSE event_type END AS event_type,
        |  cast(count(*) AS bigint) AS n
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin
  )
}
