package graft.ops

import graft._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
