package graft.ops

import graft._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** §2.7 scalar function suites — string / date / math / array / map / JSON /
  * struct, all built-in expressions (codegen'd, no UDFs).
  *
  * Cross-engine gotchas encoded here (SURVEY.md §5): DuckDB regexp_replace
  * needs the 'g' flag; Spark dayofweek is Sun=1 so ISO numbering is derived
  * arithmetically; round() goes through DECIMAL so both engines round
  * HALF_UP; ceil/floor are cast to BIGINT on both sides.
  */
object ScalarFns {

  val queries: Map[String, Q] = Map(
    "fn_string_suite" -> { (s, dir) =>
      Tables(s, dir, "part").select(
        col("p_partkey"),
        lower(trim(col("p_name"))).as("name_lower"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 5).as("name_sub"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        lpad(col("p_name"), 15, "_").as("name_pad"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        size(split(col("p_name"), " ")).as("n_words")
      ).orderBy(col("p_partkey"))
    },

    "fn_date_suite" -> { (s, dir) =>
      Tables(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        // ISO day-of-week (Mon=1..Sun=7) from Spark's Sun=1 numbering
        (((dayofweek(col("o_orderdate")) + 5) % 7) + 1).as("isodow"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).as("days_since"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m")
      ).orderBy(col("o_orderkey"))
    },

    "fn_math_suite" -> { (s, dir) =>
      val p = col("o_totalprice")
      Tables(s, dir, "orders").select(
        col("o_orderkey"),
        round(p.cast("decimal(12,2)"), 1).cast("double").as("r1"),
        abs(p - 250000.0).as("ab"),
        ceil(p).as("ce"),
        floor(p).as("fl"),
        round(log(p), 6).as("lnp"),
        round(log10(p), 6).as("l10"),
        round(sqrt(p), 6).as("sq"),
        (p * p).as("sq2"),
        signum(p - 250000.0).cast("int").as("sg")
      ).orderBy(col("o_orderkey"))
    },

    "fn_array_suite" -> { (s, dir) =>
      val toks = split(col("text"), " ")
      Tables(s, dir, "documents").select(
        col("doc_id"),
        size(toks).as("n_tok"),
        size(array_distinct(toks)).as("n_uniq"),
        concat_ws(" ", slice(array_sort(array_distinct(toks)), 1, 3)).as("first3"),
        array_contains(toks, "the").as("has_the")
      ).orderBy(col("doc_id"))
    },

    "fn_map_json_suite" -> { (s, dir) =>
      Tables(s, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"),
        size(map_keys(from_json(col("props"), MapType(StringType, StringType))))
          .as("n_keys")
      ).orderBy(col("event_id"))
    },

    // Spark 4 VariantType over the events.props JSON column: parse ONCE
    // into the binary variant encoding, then typed extraction
    // (variant_get with a target type) and missing-path null semantics —
    // the semi-structured scan shape that replaces per-access JSON
    // re-parsing (get_json_object re-tokenizes the string per call; a
    // variant column parses once and every later access is a binary
    // probe — at 100 TB of event payloads that's the whole scan budget).
    // The oracle mirrors with DuckDB's JSON extraction.
    "fn_variant_suite" -> { (s, dir) =>
      Tables(s, dir, "events")
        .withColumn("v", parse_json(col("props")))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'bigint')").as("k_long"),
          expr("variant_get(v, '$.k', 'string')").as("k_str"),
          expr("variant_get(v, '$.missing')").isNull.as("missing_null"))
        .orderBy(col("event_id"))
    },

    // parse_url over deterministic URLs built from the corpus columns
    // (all alphanumeric — no encoding divergence); the oracle mirrors
    // each part with an anchored regexp
    "fn_url_suite" -> { (s, dir) =>
      Tables(s, dir, "documents")
        .withColumn("url", concat(lit("https://"), col("source"),
          lit(".example.com/"), col("lang"), lit("/doc?id="), col("doc_id")))
        .select(col("doc_id"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY', 'id')").as("qid"))
        .orderBy(col("doc_id"))
    },

    "fn_struct_nested" -> { (s, dir) =>
      val st = struct(col("c_name").as("name"), col("c_acctbal").as("bal"),
        struct(col("c_nationkey").as("nk")).as("geo"))
      Tables(s, dir, "customer")
        .withColumn("st", st)
        .select(
          col("c_custkey"),
          col("st").getField("name").as("nm"),
          col("st").getField("bal").as("bal"),
          col("st").getField("geo").getField("nk").as("nk"))
        .orderBy(col("c_custkey"))
    }
  )

  val oracle: Map[String, String] = Map(
    "fn_string_suite" ->
      """SELECT p_partkey,
        |lower(trim(p_name)) AS name_lower,
        |upper(p_name) AS name_upper,
        |substring(p_name, 1, 5) AS name_sub,
        |concat_ws('|', p_brand, p_type) AS brand_type,
        |lpad(p_name, 15, '_') AS name_pad,
        |length(p_name) AS name_len,
        |regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
        |regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |cast(len(string_split(p_name, ' ')) as int) AS n_words
        |FROM part ORDER BY p_partkey""".stripMargin,
    "fn_date_suite" ->
      """SELECT o_orderkey,
        |cast(year(o_orderdate) as int) AS y,
        |cast(month(o_orderdate) as int) AS m,
        |cast(day(o_orderdate) as int) AS dom,
        |cast(date_part('isodow', o_orderdate) as int) AS isodow,
        |strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |cast(date_diff('day', DATE '1995-01-01', cast(o_orderdate as date)) as int) AS days_since,
        |strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_math_suite" ->
      """SELECT o_orderkey,
        |cast(round(cast(o_totalprice as decimal(12,2)), 1) as double) AS r1,
        |abs(o_totalprice - 250000.0) AS ab,
        |cast(ceil(o_totalprice) as bigint) AS ce,
        |cast(floor(o_totalprice) as bigint) AS fl,
        |round(ln(o_totalprice), 6) AS lnp,
        |round(log10(o_totalprice), 6) AS l10,
        |round(sqrt(o_totalprice), 6) AS sq,
        |o_totalprice * o_totalprice AS sq2,
        |cast(sign(o_totalprice - 250000.0) as int) AS sg
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_array_suite" ->
      """SELECT doc_id,
        |cast(len(string_split(text, ' ')) as int) AS n_tok,
        |cast(len(list_distinct(string_split(text, ' '))) as int) AS n_uniq,
        |array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ' ') AS first3,
        |list_contains(string_split(text, ' '), 'the') AS has_the
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_map_json_suite" ->
      """SELECT event_id,
        |cast(json_extract_string(props, '$.k') as int) AS k_val,
        |cast(len(json_keys(props)) as int) AS n_keys
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_variant_suite" ->
      """SELECT event_id,
        |cast(json_extract_string(props, '$.k') as bigint) AS k_long,
        |json_extract_string(props, '$.k') AS k_str,
        |json_extract(props, '$.missing') IS NULL AS missing_null
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_url_suite" ->
      """WITH u AS (SELECT doc_id,
        |  'https://' || source || '.example.com/' || lang || '/doc?id=' || doc_id AS url
        |  FROM documents)
        |SELECT doc_id,
        |regexp_extract(url, '^https://([^/]+)/', 1) AS host,
        |regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
        |regexp_extract(url, 'id=([0-9]+)', 1) AS qid
        |FROM u ORDER BY doc_id""".stripMargin,
    "fn_struct_nested" ->
      """SELECT c_custkey, c_name AS nm, c_acctbal AS bal, c_nationkey AS nk
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
