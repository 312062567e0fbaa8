package graft.ops

import graft._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-9 batch 4: BPE tokenizer-training rounds and the regex
  * function suite.
  *
  * `text_bpe_train_rounds` is the byte-pair-encoding FIT loop — the
  * tokenizer-training primitive of an LLM data pipeline: per round,
  * count adjacent token pairs across the corpus (frequency-weighted at
  * the word grain), pick the most frequent pair, and merge its
  * occurrences. Scale shape: the corpus collapses to the (word, freq)
  * vocabulary ONCE (one corpus pass); every round then runs on
  * vocabulary-sized data (the standard BPE-fit optimization — corpora
  * repeat words, so pair statistics live on the vocab). The merge is a
  * PURE PER-POSITION array rewrite: with left ≠ right (self-pairs are
  * excluded by the tiebreak), merged occurrences can never overlap, so
  * "consumed by my left neighbour" is a local predicate and the whole
  * round is transform+filter — no sequential scan, no UDF.
  */
object Extras27 {

  /** one BPE merge round over (word, freq, t): count weighted adjacent
    * pairs (left ≠ right), pick (max freq, lexicographic) pair, rewrite
    * token arrays. Returns (merged frame, 1-row winner frame). */
  private def bpeRound(toks: DataFrame): (DataFrame, DataFrame) = {
    val pairs = toks
      .select(col("freq"), explode(expr(
        """transform(slice(t, 1, size(t) - 1),
          |  (x, i) -> struct(x AS a, element_at(t, i + 2) AS b))""".stripMargin))
        .as("p"))
      .select(col("freq"), col("p.a").as("a"), col("p.b").as("b"))
      .where(col("a") =!= col("b"))
      .groupBy("a", "b").agg(sum(col("freq")).as("pair_freq"))
    val best = pairs.orderBy(col("pair_freq").desc, col("a"), col("b")).limit(1)
    val merged = toks.crossJoin(broadcast(best))
      .withColumn("t", expr(
        """filter(
          |  transform(t, (x, i) ->
          |    CASE
          |      WHEN i > 0 AND element_at(t, i) = a AND x = b
          |        THEN CAST(NULL AS STRING)
          |      WHEN i < size(t) - 1 AND x = a AND element_at(t, i + 2) = b
          |        THEN concat(a, b)
          |      ELSE x END),
          |  z -> z IS NOT NULL)""".stripMargin))
      .select(col("word"), col("freq"), col("t"))
    (merged, best)
  }

  val queries: Map[String, Q] = Map(

    // 3 BPE fit rounds over the corpus vocabulary: per round the chosen
    // merge (left, right) and its frequency-weighted occurrence count.
    "text_bpe_train_rounds" -> { (s, dir) =>
      val vocab = Tables(s, dir, "documents")
        .select(explode(split(lower(col("text")), " ")).as("word"))
        .where(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("freq"))
      val toks0 = vocab.withColumn("t", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      val (t1, b1) = bpeRound(toks0)
      val (t2, b2) = bpeRound(t1)
      val (_, b3) = bpeRound(t2)
      def row(r: Int, b: DataFrame): DataFrame =
        b.select(lit(r.toLong).as("round"), col("a").as("left"),
          col("b").as("right"), col("pair_freq"))
      row(1, b1).unionByName(row(2, b2)).unionByName(row(3, b3))
        .orderBy("round")
    },

    // outlier influence report: classic mean vs 5–95% trimmed mean vs
    // median per numeric column — how much the tails move the headline
    // statistic (the "should I clip before aggregating" profiling
    // readout). Long format via stack, exact percentile bounds
    // broadcast back, conditional exact-decimal trimmed mean.
    "profile_outlier_influence" -> { (s, dir) =>
      // NO stack/long-format: a stacked 2×-row group-by form measured
      // ~5 s (row doubling + string group keys + a mixed
      // ObjectHashAggregate); wide 1-row aggregates + a map-side
      // unpivot of 2 struct rows do the same work in ~1 s. The trimmed
      // means are CONDITIONAL sums over the broadcast bounds row — a
      // projection over the crossJoin, never a filter (a filter
      // referencing both sides degrades to a conditioned BNLJ).
      val li = Tables(s, dir, "lineitem")
      val cols = Seq("l_extendedprice", "l_quantity")
      val bAggs = count(lit(1)).as("n") +: cols.flatMap { c =>
        Seq(sum(col(c).cast(DecimalType(18, 4))).cast(DoubleType).as(s"s_$c"),
          expr(s"percentile($c, array(0.05, 0.5, 0.95))").as(s"ps_$c"))
      }
      val bounds = li.agg(bAggs.head, bAggs.tail: _*)
        .select(col("n") +: cols.flatMap { c =>
          Seq((col(s"s_$c") / col("n").cast(DoubleType)).as(s"mean_$c"),
            round(element_at(col(s"ps_$c"), 1), 4).as(s"lo_$c"),
            round(element_at(col(s"ps_$c"), 2), 4).as(s"med_$c"),
            round(element_at(col(s"ps_$c"), 3), 4).as(s"hi_$c"))
        }: _*)
      val tAggs = cols.flatMap { c =>
        Seq(sum(when(col(c) >= col(s"lo_$c") && col(c) <= col(s"hi_$c"),
            col(c).cast(DecimalType(18, 4)))).cast(DoubleType).as(s"ts_$c"),
          sum(when(col(c) >= col(s"lo_$c") && col(c) <= col(s"hi_$c"), 1L)
            .otherwise(0L)).as(s"tn_$c"))
      }
      li.crossJoin(broadcast(bounds))
        .agg(tAggs.head,
          tAggs.tail ++ Seq(max(col("n")).as("n")) ++ cols.flatMap(c =>
            Seq(max(col(s"mean_$c")).as(s"mean_$c"),
              max(col(s"med_$c")).as(s"med_$c"))): _*)
        .select(explode(array(cols.map { c =>
          val trimmed = col(s"ts_$c") / col(s"tn_$c").cast(DoubleType)
          struct(lit(c).as("col_name"), col("n"),
            round(col(s"mean_$c"), 6).as("mean"),
            col(s"med_$c").as("median"),
            round(trimmed, 6).as("trimmed_mean"),
            (round(col(s"mean_$c") - trimmed, 6) + lit(0.0))
              .as("outlier_influence"))
        }: _*)).as("r"))
        .select(col("r.*"))
        .orderBy("col_name")
    },

    // weekday seasonality index: each weekday's revenue share against
    // the uniform 1/7 — the demand-planning baseline. Weekday from the
    // epoch-day index (% 7), NEVER dayofweek() (numbering differs
    // across engines); exact decimal revenue, one double division.
    "analytics_weekday_seasonality" -> { (s, dir) =>
      val o = Tables(s, dir, "orders").select(
        // o_orderdate surfaces as TIMESTAMP_NTZ — cast to TIMESTAMP
        // first (identity under the pinned UTC session timezone)
        expr("unix_micros(cast(o_orderdate AS timestamp))" +
          " DIV 86400000000 % 7").as("weekday"),
        col("o_totalprice").cast(DecimalType(18, 4)).as("rev"))
      val daily = o.groupBy("weekday")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("rev")).cast(DecimalType(18, 4)).as("revd"))
      val tot = daily.agg(sum(col("revd")).cast(DecimalType(18, 4)).as("tot"))
      daily.crossJoin(broadcast(tot))
        .select(col("weekday"), col("n_orders"),
          round(col("revd").cast(DoubleType) / col("tot").cast(DoubleType), 6)
            .as("rev_share"),
          round(col("revd").cast(DoubleType) / col("tot").cast(DoubleType) *
            7.0, 6).as("seasonality_index"))
        .orderBy("weekday")
    },

    // per-user behavioral entropy: Shannon entropy of each user's
    // event-type distribution — the diversity score separating
    // single-action bots from organic users. Per-(user, type) counts
    // reduce map-side; entropy terms quantize DECIMAL(18,12) per row
    // (identical trees both engines) and sum exactly per user.
    "events_entropy_per_user" -> { (s, dir) =>
      val c = Tables(s, dir, "events")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      val n = c.groupBy("user_id").agg(sum(col("c")).as("n"))
      c.join(n, "user_id")
        .select(col("user_id"), col("n"),
          ((-(col("c").cast(DoubleType) / col("n").cast(DoubleType))) *
            log(col("c").cast(DoubleType) / col("n").cast(DoubleType)))
            .cast(DecimalType(18, 12)).as("term"))
        .groupBy("user_id")
        .agg(max(col("n")).as("n_events"),
          round(sum(col("term")).cast(DoubleType), 6).as("entropy"))
        .orderBy("user_id")
    },

    // grouping_id over a rollup — the §2.4 completion that
    // distinguishes "NULL because rolled up" from "NULL in the data":
    // revenue rollup over (returnflag, linestatus) with the grouping
    // bitmask and per-level labels.
    "agg_rollup_grouping_id" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_extendedprice").cast(DecimalType(18, 4)).as("rev"))
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("rev")).cast(DoubleType).as("revenue"),
          grouping_id().as("gid"),
          grouping(col("l_returnflag")).cast("long").as("g_rf"),
          grouping(col("l_linestatus")).cast("long").as("g_ls"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    },

    // stationary distribution of the event-type Markov chain: row-
    // normalized transition matrix from per-user lagged sequences, then
    // 3 power iterations from the uniform vector — where user traffic
    // settles. The matrix is k² rows (k = event types); every iteration
    // is a tiny broadcast join + exact-decimal-term aggregation (the
    // pagerank discipline: π·P products quantized DECIMAL(18,12) before
    // the sum, so partition order can't move the result).
    "events_markov_stationary" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_id"), col("event_type"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val trans = e.withColumn("from_type", lag(col("event_type"), 1).over(w))
        .where(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val totals = trans.groupBy("from_type").agg(sum(col("n")).as("tot"))
      val p = trans.join(totals, "from_type")
        .select(col("from_type"), col("to_type"),
          (col("n").cast(DoubleType) / col("tot").cast(DoubleType)).as("p"))
        .localCheckpoint(false) // k²-row matrix feeds all 3 iterations
      val states = e.select(col("event_type").as("state")).distinct()
      val pi0 = states.crossJoin(broadcast(states.agg(count(lit(1)).as("k"))))
        .select(col("state"), (lit(1.0) / col("k").cast(DoubleType)).as("pi"))
      val pi3 = (1 to 3).foldLeft(pi0) { (pi, _) =>
        pi.join(p, pi("state") === p("from_type"))
          .select(col("to_type").as("state"),
            (col("pi") * col("p")).cast(DecimalType(18, 12)).as("term"))
          .groupBy("state")
          .agg(sum(col("term")).cast(DoubleType).as("pi"))
      }
      pi3.select(col("state").as("event_type"), round(col("pi"), 6).as("pi"))
        .orderBy("event_type")
    },

    // content-addressed corpus fingerprint — "did the corpus change?"
    // as one short digest, computed MERKLE-STYLE: per-doc hashes sort
    // and digest WITHIN 64 id-buckets, then the 64 bucket digests sort
    // and digest once — no global collect of per-doc hashes (the flat
    // string_agg-of-everything needs the whole corpus's hashes on one
    // node; the two-level tree keeps every aggregation bucket-bounded).
    "pipeline_dataset_fingerprint" -> { (s, dir) =>
      val h = Tables(s, dir, "documents")
        .select((col("doc_id") % 64L).as("bucket"),
          md5(col("text").cast("binary")).as("h"))
      val lvl1 = h.groupBy("bucket")
        .agg(md5(concat_ws("", array_sort(collect_list(col("h"))))
          .cast("binary")).as("bh"), count(lit(1)).as("n"))
      lvl1.agg(sum(col("n")).as("n_docs"), count(lit(1)).as("n_buckets"),
        md5(concat_ws("", array_sort(collect_list(col("bh"))))
          .cast("binary")).as("corpus_digest"))
    },

    // regex function suite over part names (RE2-safe dialect: no
    // backreferences/lookaround, so the Java and RE2 engines agree).
    "fn_regex_suite" -> { (s, dir) =>
      Tables(s, dir, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
        regexp_count(col("p_name"), lit("[aeiou]+")).cast("long")
          .as("vowel_runs"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("devoweled"),
        col("p_name").rlike("red|green|blue").as("has_color"))
        .orderBy("p_partkey")
    }
  )

  val oracle: Map[String, String] = Map(
    // the merge rewrite mirrors the Spark lambda 1:1; DuckDB list
    // lambdas index from 1 (Spark's index from 0), hence the shifted
    // guards. Round CTEs are MATERIALIZED (DuckDB re-inlines plain CTEs
    // at every reference — the kcore trap).
    "text_bpe_train_rounds" -> {
      def roundSql(r: Int): String =
        s"""p$r AS MATERIALIZED (
           |  SELECT a, b, cast(sum(freq) AS bigint) AS pair_freq
           |  FROM (SELECT freq, t[i] AS a, t[i + 1] AS b
           |        FROM t${r - 1}, unnest(range(1, len(t))) AS u(i))
           |  WHERE a <> b GROUP BY a, b),
           |b$r AS MATERIALIZED (SELECT a, b, pair_freq FROM p$r
           |  ORDER BY pair_freq DESC, a, b LIMIT 1),
           |t$r AS MATERIALIZED (
           |  SELECT word, freq,
           |    list_filter(
           |      list_transform(t, (x, i) ->
           |        CASE
           |          WHEN i > 1 AND t[i - 1] = b$r.a AND x = b$r.b THEN NULL
           |          WHEN i < len(t) AND x = b$r.a AND t[i + 1] = b$r.b
           |            THEN b$r.a || b$r.b
           |          ELSE x END),
           |      z -> z IS NOT NULL) AS t
           |  FROM t${r - 1} CROSS JOIN b$r)""".stripMargin
      s"""WITH vocab AS (
         |  SELECT word, cast(count(*) AS bigint) AS freq
         |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
         |        FROM documents)
         |  WHERE word <> '' GROUP BY word),
         |t0 AS MATERIALIZED (SELECT word, freq,
         |    list_transform(generate_series(1, length(word)),
         |      i -> substring(word, i, 1)) AS t
         |  FROM vocab),
         |${roundSql(1)},
         |${roundSql(2)},
         |${roundSql(3)}
         |SELECT round, "left", "right", pair_freq FROM (
         |  SELECT cast(1 AS bigint) AS round, a AS "left", b AS "right",
         |    pair_freq FROM b1
         |  UNION ALL SELECT cast(2 AS bigint), a, b, pair_freq FROM b2
         |  UNION ALL SELECT cast(3 AS bigint), a, b, pair_freq FROM b3)
         |ORDER BY round""".stripMargin
    },
    "profile_outlier_influence" ->
      """WITH u AS (
        |  SELECT 'l_extendedprice' AS col_name, l_extendedprice AS v
        |  FROM lineitem
        |  UNION ALL SELECT 'l_quantity', l_quantity FROM lineitem),
        |b AS (SELECT col_name, cast(count(*) AS bigint) AS n,
        |    cast(sum(cast(v AS decimal(18,4))) AS double) / count(*)
        |      AS mean_raw,
        |    round(quantile_cont(v, 0.05), 4) AS lo,
        |    round(quantile_cont(v, 0.5), 4) AS median_r4,
        |    round(quantile_cont(v, 0.95), 4) AS hi
        |  FROM u GROUP BY col_name),
        |t AS (SELECT u.col_name,
        |    cast(sum(cast(v AS decimal(18,4))) AS double) / count(*)
        |      AS trimmed_raw
        |  FROM u JOIN b ON u.col_name = b.col_name AND v >= lo AND v <= hi
        |  GROUP BY u.col_name)
        |SELECT b.col_name AS col_name, n, round(mean_raw, 6) AS mean,
        |  median_r4 AS median, round(trimmed_raw, 6) AS trimmed_mean,
        |  round(mean_raw - trimmed_raw, 6) + 0.0 AS outlier_influence
        |FROM b JOIN t ON b.col_name = t.col_name ORDER BY b.col_name"""
        .stripMargin,
    "analytics_weekday_seasonality" ->
      """WITH o AS (SELECT epoch_us(o_orderdate) // 86400000000 % 7
        |      AS weekday,
        |    cast(o_totalprice AS decimal(18,4)) AS rev
        |  FROM orders),
        |d AS (SELECT weekday, cast(count(*) AS bigint) AS n_orders,
        |    cast(sum(rev) AS decimal(18,4)) AS revd
        |  FROM o GROUP BY weekday),
        |t AS (SELECT cast(sum(revd) AS decimal(18,4)) AS tot FROM d)
        |SELECT weekday, n_orders,
        |  round(cast(revd AS double) / cast(tot AS double), 6) AS rev_share,
        |  round(cast(revd AS double) / cast(tot AS double) * 7.0, 6)
        |    AS seasonality_index
        |FROM d CROSS JOIN t ORDER BY weekday""".stripMargin,
    "events_entropy_per_user" ->
      """WITH c AS (SELECT user_id, event_type, cast(count(*) AS bigint) AS c
        |  FROM events GROUP BY user_id, event_type),
        |n AS (SELECT user_id, cast(sum(c) AS bigint) AS n
        |  FROM c GROUP BY user_id),
        |t AS (SELECT c.user_id, n.n,
        |    cast(-(cast(c AS double) / cast(n AS double))
        |      * ln(cast(c AS double) / cast(n AS double))
        |      AS decimal(18,12)) AS term
        |  FROM c JOIN n ON c.user_id = n.user_id)
        |SELECT user_id, max(n) AS n_events,
        |  round(cast(sum(term) AS double), 6) AS entropy
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin,
    "agg_rollup_grouping_id" ->
      """SELECT l_returnflag, l_linestatus, cast(count(*) AS bigint) AS n,
        |  cast(sum(cast(l_extendedprice AS decimal(18,4))) AS double)
        |    AS revenue,
        |  cast(grouping(l_returnflag, l_linestatus) AS bigint) AS gid,
        |  cast(grouping(l_returnflag) AS bigint) AS g_rf,
        |  cast(grouping(l_linestatus) AS bigint) AS g_ls
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
        .stripMargin,
    "events_markov_stationary" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
        |           FROM events),
        |t AS (SELECT user_id, event_type AS to_type,
        |    lag(event_type) OVER w AS from_type
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |c AS (SELECT from_type, to_type, cast(count(*) AS bigint) AS n
        |  FROM t WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, cast(sum(n) AS bigint) AS tot
        |  FROM c GROUP BY 1),
        |p AS MATERIALIZED (SELECT c.from_type, c.to_type,
        |    cast(n AS double) / cast(tot AS double) AS p
        |  FROM c JOIN tot USING (from_type)),
        |st AS MATERIALIZED (SELECT DISTINCT event_type AS state FROM e),
        |kk AS (SELECT cast(count(*) AS bigint) AS k FROM st),
        |pi0 AS (SELECT state, 1.0 / cast(k AS double) AS pi
        |        FROM st CROSS JOIN kk),
        |pi1 AS MATERIALIZED (SELECT to_type AS state,
        |    cast(sum(cast(pi * p AS decimal(18,12))) AS double) AS pi
        |  FROM pi0 JOIN p ON state = from_type GROUP BY 1),
        |pi2 AS MATERIALIZED (SELECT to_type AS state,
        |    cast(sum(cast(pi * p AS decimal(18,12))) AS double) AS pi
        |  FROM pi1 JOIN p ON state = from_type GROUP BY 1),
        |pi3 AS (SELECT to_type AS state,
        |    cast(sum(cast(pi * p AS decimal(18,12))) AS double) AS pi
        |  FROM pi2 JOIN p ON state = from_type GROUP BY 1)
        |SELECT state AS event_type, round(pi, 6) AS pi
        |FROM pi3 ORDER BY event_type""".stripMargin,
    "pipeline_dataset_fingerprint" ->
      """WITH h AS (SELECT doc_id % 64 AS bucket, md5(text) AS h
        |           FROM documents),
        |l1 AS (SELECT bucket, md5(string_agg(h, '' ORDER BY h)) AS bh,
        |         cast(count(*) AS bigint) AS n
        |       FROM h GROUP BY bucket)
        |SELECT cast(sum(n) AS bigint) AS n_docs,
        |  cast(count(*) AS bigint) AS n_buckets,
        |  md5(string_agg(bh, '' ORDER BY bh)) AS corpus_digest
        |FROM l1""".stripMargin,
    "fn_regex_suite" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |  cast(len(regexp_extract_all(p_name, '[aeiou]+')) AS bigint)
        |    AS vowel_runs,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
        |  regexp_matches(p_name, 'red|green|blue') AS has_color
        |FROM part ORDER BY p_partkey""".stripMargin
  )
}
