package graft.ops

import graft._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Round-8 fifth-session batch 20: purchase-path mining, duplicate
  * invoice detection, train/test leakage measurement, and concurrency
  * peaks.
  *
  * Scale discipline: paths come from bounded per-user lag windows;
  * duplicate detection is an equi-join on the (customer, amount-band)
  * composite — pair fan-out bounded per band, never a theta join;
  * leakage is a distinct-gram semi-join (shuffle keyed on the gram);
  * concurrency peaks are (day, hour) aggregates + a struct argmax per
  * day.
  *
  * Float discipline: everything is integer counting; shares/rates are
  * single divisions, round-6; amount bands are floor(x/1000) — an
  * IEEE divide + floor, identical in both engines.
  */
object Extras23 {

  val queries: Map[String, Q] = Map(

    // most common 3-step paths ending in purchase — the conversion
    // context report (what users do right before buying).
    "events_path_to_purchase" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(
        col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val paths = e
        .withColumn("t1", lag(col("event_type"), 1).over(w))
        .withColumn("t2", lag(col("event_type"), 2).over(w))
        .where(col("event_type") === "purchase" &&
          col("t1").isNotNull && col("t2").isNotNull)
        .select(concat_ws(">", col("t2"), col("t1"), col("event_type"))
          .as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
      paths.crossJoin(broadcast(paths.agg(sum(col("n")).as("tot"))))
        .select(col("path"), col("n"),
          round(col("n").cast(DoubleType) / col("tot").cast(DoubleType), 6)
            .as("share"))
        .orderBy(col("n").desc, col("path")).limit(20)
    },

    // duplicate-invoice candidates: same customer, same $1000 amount
    // band, placed within a year (7-day windows are empty at the small
    // SFs — probed; the operator shape is the point) — the
    // fraud/cleaning sweep. The join
    // key is the (customer, band) composite, so pair expansion is
    // bounded per band, never an open theta join.
    "analytics_duplicate_invoice_detect" -> { (s, dir) =>
      val o = Tables(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_custkey").as("c"),
        floor(col("o_totalprice") / 1000.0).as("band"),
        to_date(col("o_orderdate")).as("d"))
      val a = o.select(col("k").as("k1"), col("c"), col("band"),
        col("d").as("d1"))
      val b = o.select(col("k").as("k2"), col("c"), col("band"),
        col("d").as("d2"))
      a.join(b, Seq("c", "band"))
        .where(col("k1") < col("k2") &&
          abs(datediff(col("d2"), col("d1"))) <= 365)
        .select(col("k1"), col("k2"), col("c").as("custkey"), col("band"),
          abs(datediff(col("d2"), col("d1"))).cast("long").as("gap_d"))
        .orderBy("k1", "k2")
    },

    // train/test n-gram leakage: how many held-out docs share at least
    // one 8-gram with the training split — the decontamination
    // HEALTH METRIC (text_decontaminate removes leakage; this measures
    // it). Distinct-gram semi-join, shuffle keyed on the gram.
    "text_split_leakage_eval" -> { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val trainGrams = GraftOps.shingleSet(
        docs.where(col("doc_id") % 10 < 8), "doc_id", "text", 8)
        .select(col("bg")).distinct()
      val testGrams = GraftOps.shingleSet(
        docs.where(col("doc_id") % 10 >= 8), "doc_id", "text", 8)
      val leaked = testGrams.join(trainGrams, Seq("bg"), "left_semi")
        .select("doc_id").distinct()
        .agg(count(lit(1)).as("n_leaked"))
      val nTr = docs.where(col("doc_id") % 10 < 8)
        .agg(count(lit(1)).as("n_train_docs"))
      val nTe = docs.where(col("doc_id") % 10 >= 8)
        .agg(count(lit(1)).as("n_test_docs"))
      nTr.crossJoin(broadcast(nTe)).crossJoin(broadcast(leaked))
        .select(col("n_train_docs"), col("n_test_docs"), col("n_leaked"),
          round(col("n_leaked").cast(DoubleType) /
            col("n_test_docs").cast(DoubleType), 6).as("leak_rate"))
    },

    // hourly-active-user concurrency peak per day (which hour is the
    // daily load peak, and how high) — capacity planning's first
    // number; ties break to the later hour.
    "events_hourly_active_peak" -> { (s, dir) =>
      val e = Tables(s, dir, "events").select(
        expr("unix_micros(ts) DIV 86400000000").as("day"),
        expr("(unix_micros(ts) DIV 3600000000) % 24").as("hour"),
        col("user_id"))
      e.groupBy("day", "hour")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .groupBy("day")
        .agg(sum(col("n_users")).as("user_hours"),
          max(struct(col("n_users"), col("hour"))).as("m"))
        .select(col("day"), col("m.hour").as("peak_hour"),
          col("m.n_users").as("peak_users"), col("user_hours"))
        .orderBy("day")
    }
  )

  val oracle: Map[String, String] = Map(
    "events_path_to_purchase" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |           FROM events),
        |p AS (SELECT event_type,
        |    lag(event_type, 1) OVER w AS t1, lag(event_type, 2) OVER w AS t2
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |c AS (SELECT t2 || '>' || t1 || '>' || event_type AS path,
        |    cast(count(*) AS bigint) AS n
        |  FROM p WHERE event_type = 'purchase' AND t1 IS NOT NULL
        |    AND t2 IS NOT NULL
        |  GROUP BY 1),
        |t AS (SELECT cast(sum(n) AS bigint) AS tot FROM c)
        |SELECT path, n,
        |  round(cast(n AS double) / cast(tot AS double), 6) AS share
        |FROM c CROSS JOIN t ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "analytics_duplicate_invoice_detect" ->
      """WITH o AS (SELECT o_orderkey AS k, o_custkey AS c,
        |    cast(floor(o_totalprice / 1000.0) AS bigint) AS band,
        |    cast(o_orderdate AS date) AS d
        |  FROM orders)
        |SELECT a.k AS k1, b.k AS k2, a.c AS custkey, a.band,
        |  cast(abs(date_diff('day', a.d, b.d)) AS bigint) AS gap_d
        |FROM o a JOIN o b ON a.c = b.c AND a.band = b.band AND a.k < b.k
        |WHERE abs(date_diff('day', a.d, b.d)) <= 365
        |ORDER BY k1, k2""".stripMargin,
    "text_split_leakage_eval" ->
      """WITH pos AS (SELECT doc_id,
        |    unnest(string_split(lower(text), ' ')) AS word,
        |    generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        |  FROM documents),
        |g AS (SELECT DISTINCT doc_id, bg FROM (
        |  SELECT doc_id, word
        |    || ' ' || lead(word, 1) OVER w || ' ' || lead(word, 2) OVER w
        |    || ' ' || lead(word, 3) OVER w || ' ' || lead(word, 4) OVER w
        |    || ' ' || lead(word, 5) OVER w || ' ' || lead(word, 6) OVER w
        |    || ' ' || lead(word, 7) OVER w AS bg
        |  FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
        |  WHERE bg IS NOT NULL),
        |tr AS (SELECT DISTINCT bg FROM g WHERE doc_id % 10 < 8),
        |te AS (SELECT doc_id, bg FROM g WHERE doc_id % 10 >= 8),
        |lk AS (SELECT cast(count(DISTINCT doc_id) AS bigint) AS n_leaked
        |  FROM te WHERE bg IN (SELECT bg FROM tr)),
        |ntr AS (SELECT cast(count(*) AS bigint) AS n_train_docs
        |  FROM documents WHERE doc_id % 10 < 8),
        |nte AS (SELECT cast(count(*) AS bigint) AS n_test_docs
        |  FROM documents WHERE doc_id % 10 >= 8)
        |SELECT n_train_docs, n_test_docs, n_leaked,
        |  round(cast(n_leaked AS double) / cast(n_test_docs AS double), 6)
        |    AS leak_rate
        |FROM ntr CROSS JOIN nte CROSS JOIN lk""".stripMargin,
    "events_hourly_active_peak" ->
      """WITH h AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |    (epoch_us(ts) // 3600000000) % 24 AS hour,
        |    cast(count(DISTINCT user_id) AS bigint) AS n_users
        |  FROM events GROUP BY 1, 2)
        |SELECT day,
        |  (max(struct_pack(n_users := n_users, hour := hour))).hour
        |    AS peak_hour,
        |  (max(struct_pack(n_users := n_users, hour := hour))).n_users
        |    AS peak_users,
        |  cast(sum(n_users) AS bigint) AS user_hours
        |FROM h GROUP BY day ORDER BY day""".stripMargin
  )
}
