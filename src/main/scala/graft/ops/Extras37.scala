package graft.ops

import graft._
import graft.Tables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round 11 batch 3: the skew PRE-FLIGHT a pipeline runs before keyed
  * shuffles, and the per-source duplication profile that turns the
  * exact-substring machinery into a mix-planning signal. */
object Extras37 {

  private val seq = new java.util.concurrent.atomic.AtomicLong()

  val queries: Map[String, Q] = Map(

    // key-concentration audit over the three hottest shuffle keys — the
    // numbers that predict whether AQE skew-split / salting will be
    // needed (the SkewProbe's planted corpora make these move): effective
    // key count N²/Σc² (inverse Simpson — "how many keys does the shuffle
    // BEHAVE like"), the single hottest key's share, and the share of the
    // top 0.1% of keys. The sorted cumulative rides distributedRank
    // (never a single-partition window); the cast to DECIMAL(38,0) happens
    // BEFORE the multiply so c² itself never wraps int64 (a key owning
    // ~3B rows would overflow a long·long product);
    // all divisions are single IEEE ops over exactly-representable
    // integer sums, so raw doubles hash-match.
    "profile_key_concentration" -> { (s, dir) =>
      // r14 rework (guide §2.4): the three audits used to run three
      // independent distributedRank kernels, each through the JOIN-BACK
      // path (cnt rode outside the rank struct → a counts⋈counts
      // struct-equality join per table), plus three crossJoin-aggregate
      // passes. The three key censuses are comparable in size, so ONE
      // tagged kernel ranks all of them (partition = the audited key
      // name), cnt rides INSIDE the rank order as its negation (cnt =
      // −nc — join-back eliminated), and the per-table scalars reduce in
      // one groupBy(key_col) instead of three crossJoins. Per-tag ranks,
      // sums and shares are identical value for value.
      def counts(keyName: String, df: DataFrame, key: String): DataFrame =
        df.groupBy(col(key).as("k")).agg(count(lit(1)).as("cnt"))
          .select(lit(keyName).as("key_col"), (-col("cnt")).as("nc"), col("k"))
      val census = counts("events.user_id", Tables(s, dir, "events"), "user_id")
        .unionAll(counts("lineitem.l_orderkey",
          Tables(s, dir, "lineitem"), "l_orderkey"))
        .unionAll(counts("orders.o_custkey",
          Tables(s, dir, "orders"), "o_custkey"))
        .localCheckpoint(false) // feeds the rank kernel AND the totals
      val lite = census.select(col("key_col").as("__np"),
        struct(col("nc"), col("k")).as("__nk"), lit(1L).as("__nv"))
      val ranked = graft.llm.Chunking
        .distributedRunningSum(lite, "__np", "__nk", "__nv", "i")
        .select(col("__np").as("key_col"),
          (-col("__nk").getField("nc")).as("cnt"), col("i"))
      val tots = census.groupBy(col("key_col").as("tk"))
        .agg(count(lit(1)).as("n_keys"),
          sum(-col("nc")).as("n_rows"),
          sum(col("nc").cast(DecimalType(38, 0)) * col("nc"))
            .cast(DoubleType).as("c2"),
          max(-col("nc")).as("max_cnt"))
      ranked.join(broadcast(tots), col("key_col") === col("tk"))
        .groupBy(col("key_col"))
        .agg(
          max(col("n_keys")).as("n_keys"),
          max(col("n_rows")).as("n_rows"),
          // n_rows² in DOUBLE (long·long overflows int64 once a table
          // passes ~3B rows; both engines square the same exact double)
          ((max(col("n_rows")).cast(DoubleType) *
            max(col("n_rows")).cast(DoubleType)) /
            max(col("c2"))).as("eff_keys"),
          (max(col("max_cnt")).cast(DoubleType) /
            max(col("n_rows")).cast(DoubleType)).as("top1_share"),
          (sum(when(col("i") <= ceil(lit(0.001) * col("n_keys")),
            col("cnt")).otherwise(0L)).cast(DoubleType) /
            max(col("n_rows")).cast(DoubleType)).as("top_permille_share"))
        .select(col("key_col"), col("n_keys"), col("n_rows"),
          col("eff_keys"), col("top1_share"), col("top_permille_share"))
        .orderBy("key_col")
    },

    // per-source repeated-span profile — which sources are
    // boilerplate-heavy, the signal a mix planner weighs BEFORE paying
    // for the substring cut. Same seed/island machinery as
    // text_substr_dedup (llm.SubstrDedup.repeatedSpans, minWords = 8 to
    // surface the corpus's natural repetition), aggregated to source
    // grain: token mass, duplicated-token mass, share.
    "text_substr_dup_profile" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      val spans = llm.SubstrDedup.repeatedSpans(
        docs.select("doc_id", "text"), 8)
      val perDoc = spans.groupBy("doc_id")
        .agg(sum(col("en") - col("st")).as("dup_tokens"),
          count(lit(1)).as("n_spans"))
      docs
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .join(perDoc, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(coalesce(col("dup_tokens"), lit(0L))).as("dup_tokens"),
          sum(coalesce(col("n_spans"), lit(0L))).as("n_spans"),
          round(sum(coalesce(col("dup_tokens"), lit(0L))).cast(DoubleType) /
            sum(col("n_tokens")).cast(DoubleType), 6).as("dup_share"))
        .orderBy("source")
    }
  )

  val oracle: Map[String, String] = Map(
    "profile_key_concentration" -> {
      def one(keyName: String, table: String, key: String): String =
        s"""SELECT '$keyName' AS key_col,
           |  cast(count(*) AS bigint) AS n_keys,
           |  cast(sum(cnt) AS bigint) AS n_rows,
           |  (cast(sum(cnt) AS double) * cast(sum(cnt) AS double)) /
           |    cast(sum(cast(cnt AS hugeint) * cnt) AS double) AS eff_keys,
           |  cast(max(cnt) AS double) / cast(sum(cnt) AS double)
           |    AS top1_share,
           |  cast(sum(CASE WHEN rn <= ceil(cast(0.001 AS double) * nk)
           |    THEN cnt ELSE 0 END) AS double) / cast(sum(cnt) AS double)
           |    AS top_permille_share
           |FROM (
           |  SELECT cnt,
           |    row_number() OVER (ORDER BY cnt DESC, k) AS rn,
           |    count(*) OVER () AS nk
           |  FROM (SELECT $key AS k, count(*) AS cnt FROM $table GROUP BY 1))""".stripMargin
      Seq(one("events.user_id", "events", "user_id"),
        one("lineitem.l_orderkey", "lineitem", "l_orderkey"),
        one("orders.o_custkey", "orders", "o_custkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY key_col")
    },
    // same seed/island pipeline as text_substr_dedup's oracle, minWords=8,
    // no plant, aggregated per source
    "text_substr_dup_profile" ->
      """WITH w AS (
        |  SELECT d.doc_id, u.el.i - 1 AS pos, u.el.s AS w
        |  FROM documents d, unnest(list_transform(string_split(d.text, ' '),
        |    (s0, i) -> struct_pack(s := s0, i := i))) AS u(el)),
        |g AS (
        |  SELECT a.doc_id, a.pos AS p,
        |    md5(string_agg(b.w, ' ' ORDER BY b.pos)) AS h
        |  FROM w a JOIN w b ON a.doc_id = b.doc_id
        |    AND b.pos BETWEEN a.pos AND a.pos + 7
        |  GROUP BY a.doc_id, a.pos HAVING count(*) = 8),
        |seeds AS (
        |  SELECT doc_id, p FROM (
        |    SELECT doc_id, p, count(*) OVER (PARTITION BY h) AS cnt FROM g)
        |  WHERE cnt >= 2),
        |isl AS (
        |  SELECT doc_id, p,
        |    sum(CASE WHEN pm IS NULL OR p > pm + 8 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY p) AS island
        |  FROM (SELECT doc_id, p,
        |      max(p) OVER (PARTITION BY doc_id ORDER BY p
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        |    FROM seeds)),
        |sp AS (
        |  SELECT doc_id, island, min(p) AS st, max(p) + 8 AS en
        |  FROM isl GROUP BY doc_id, island),
        |pd AS (
        |  SELECT doc_id, cast(sum(en - st) AS bigint) AS dup_tokens,
        |    cast(count(*) AS bigint) AS n_spans
        |  FROM sp GROUP BY doc_id)
        |SELECT d.source,
        |  cast(count(*) AS bigint) AS n_docs,
        |  cast(sum(len(string_split(d.text, ' '))) AS bigint) AS n_tokens,
        |  cast(sum(coalesce(pd.dup_tokens, 0)) AS bigint) AS dup_tokens,
        |  cast(sum(coalesce(pd.n_spans, 0)) AS bigint) AS n_spans,
        |  round(cast(sum(coalesce(pd.dup_tokens, 0)) AS double) /
        |    cast(sum(len(string_split(d.text, ' '))) AS double), 6)
        |    AS dup_share
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin
  )
}
