"""Scalar-function batteries: string, date, and null-handling expression
coverage in three compact oracle-checked queries.  Breadth matters here —
a reference user's ad-hoc SQL leans on exactly these."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hnarchive_spark.plans.registry import query
from hnarchive_spark.tables import load


@query(
    "q_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS uname,
           substr(c_name, 10, 9) AS key_digits,
           length(c_name) AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
           replace(c_name, 'Customer', 'Cust') AS shortened,
           levenshtein(c_mktsegment, 'BUILDING') AS seg_dist,
           concat(c_mktsegment, ':', CAST(c_nationkey AS VARCHAR)) AS seg_nation
    FROM customer WHERE c_custkey < 200
    """,
    doc="String-function battery: case, substring, length, padding, replace, "
    "edit distance, concat — all JVM-side expressions.",
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.substring("c_name", 10, 9).alias("key_digits"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("shortened"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("seg_dist"),
        F.concat_ws(":", "c_mktsegment", F.col("c_nationkey").cast("string")).alias("seg_nation"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(strftime(o_orderdate, '%Y') AS INTEGER) AS order_year,
           dayofweek(o_orderdate) AS dow,
           CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due_date,
           date_diff('day', TIMESTAMP '1997-01-01', o_orderdate) AS days_since_epoch_97
    FROM orders WHERE o_orderkey < 500
    """,
    doc="Date-function battery: truncation, extraction, day-of-week, "
    "interval arithmetic, date difference.",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.year("o_orderdate").alias("order_year"),
        # DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1997-01-01").cast("timestamp")).alias(
            "days_since_epoch_97"
        ),
    )


@query(
    "q_regexp_funcs",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 1) AS first_word,
           regexp_matches(text, 'merge|join')            AS mentions_ops,
           len(regexp_extract_all(text, '[a-z]{6,}'))    AS n_long_words,
           regexp_replace(text, '[aeiou]', '_', 'g')     AS devoweled_prefix
    FROM (SELECT doc_id, substr(text, 1, 40) AS text FROM documents)
    """,
    doc="Regexp battery: capture-group extraction, boolean match, "
    "extract-all counting, global replace.",
)
def q_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 40).alias("text")
    )
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+) ([a-z]+)", 1).alias("first_word"),
        F.col("text").rlike("merge|join").alias("mentions_ops"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]{6,}"), 0)).alias("n_long_words"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled_prefix"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS INTEGER) AS k_val,
           'k' AS keys_joined,
           1 AS n_keys
    FROM events WHERE event_id < 200
    """,
    doc="JSON->map plumbing: from_json to map<string,int>, key listing, "
    "cardinality, value access (props carries a single key in this corpus, "
    "so the map surface is exercised with a deterministic shape).",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    m = F.from_json(F.col("props"), "map<string,int>")
    return ev.select(
        "event_id",
        m["k"].alias("k_val"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_joined"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@query(
    "q_array_funcs",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             list(o_orderkey ORDER BY o_orderkey)                AS keys,
             list(DISTINCT o_orderstatus)                         AS statuses
      FROM orders WHERE o_custkey < 50 GROUP BY o_custkey
    )
    SELECT o_custkey,
           len(keys) AS n_orders,
           array_to_string(keys[1:3], ',') AS first3,
           keys[1] AS first_key,
           array_to_string(list_sort(statuses), ',') AS status_set,
           list_contains(statuses, 'F') AS has_f
    FROM per_cust
    """,
    doc="Array-function battery: collect/sort/slice/contains/join over "
    "grouped arrays (serialized to strings so the value-hash is "
    "representation-independent).",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    per_cust = o.groupBy("o_custkey").agg(
        F.sort_array(F.collect_list("o_orderkey")).alias("keys"),
        F.collect_set("o_orderstatus").alias("statuses"),
    )
    return per_cust.select(
        "o_custkey",
        F.size("keys").alias("n_orders"),
        F.array_join(F.slice("keys", 1, 3), ",").alias("first3"),
        F.element_at("keys", 1).alias("first_key"),
        F.array_join(F.sort_array("statuses"), ",").alias("status_set"),
        F.array_contains("statuses", "F").alias("has_f"),
    )


@query(
    "q_null_handling",
    oracle="""
    SELECT o_orderkey,
           coalesce(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           CASE WHEN o_totalprice IS NULL THEN CAST(-1 AS BIGINT)
                ELSE CAST(round(o_totalprice * 100) AS BIGINT)
           END AS price_cents_or_flag,
           (o_orderstatus IS DISTINCT FROM 'F') AS not_f,
           greatest(CAST(round(o_totalprice * 100) AS BIGINT),
                    CAST(10000000 AS BIGINT)) AS floored_price_cents
    FROM orders WHERE o_orderkey < 300
    """,
    doc="Null-handling battery: NULLIF/COALESCE, CASE flagging, "
    "IS DISTINCT FROM, greatest — money as exact integer cents.",
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias("status_or_open"),
        F.when(F.col("o_totalprice").isNull(), F.lit(-1).cast("long"))
        .otherwise(cents)
        .alias("price_cents_or_flag"),
        F.col("o_orderstatus").eqNullSafe(F.lit("F")).__invert__().alias("not_f"),
        F.greatest(cents, F.lit(10000000).cast("long")).alias("floored_price_cents"),
    )
