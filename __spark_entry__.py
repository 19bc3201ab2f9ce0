"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001. ``queries()``
exposes one named query per implemented operator (SURVEY.md §2 +
extensions); ``oracle_sql()`` gives the DuckDB-runnable ANSI
equivalent for each (omitted only for genuinely non-SQL ops).

Determinism notes (so Spark and DuckDB hash-match):
- Money-scale sums are computed over ``decimal(38,6)`` casts (exact,
  order-independent) then cast back to double.
- Log-space / ratio aggregates are rounded to 6 decimals — their
  magnitudes make FP-order noise ≪ the rounding step.
- Every window/top-k order has a unique tie-break column.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdsa_utils_spark.functions.averages import (
    get_weight_shares,
    unweighted_geometric_average,
)
from rdsa_utils_spark.functions.columns import exact_median
from rdsa_utils_spark.operators.dedup import exact_dedup
from rdsa_utils_spark.operators.filters import filter_out_values, map_column_values
from rdsa_utils_spark.operators.joins import asof_join, join_multi_dfs
from rdsa_utils_spark.operators.reshape import melt
from rdsa_utils_spark.operators.sets import union_mismatched_dfs
from rdsa_utils_spark.operators.similarity import brute_force_topk
from rdsa_utils_spark.operators.text import with_text_stats
from rdsa_utils_spark.operators.windows import (
    drop_duplicates_reproducible,
    get_window_spec,
    top_k_per_group,
)
from rdsa_utils_spark.sources.readers import read_parquet
from rdsa_utils_spark.streaming.windows_time import (
    sessionize_by_gap,
    tumbling_window_agg,
)

SF_DEFAULT = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


def _dsum(col, alias: str):
    """Order-independent sum: decimal(38,6) accumulate → double."""
    return F.sum(col.cast("decimal(38,6)")).cast("double").alias(alias)


# --------------------------------------------------------------------------
# Flagship: revenue by nation (scan → filter → 4-way join → agg → sort)
# --------------------------------------------------------------------------

def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    # Dimension tables broadcast; the fact table only shuffles for the
    # final aggregation (map-side partials first).
    dims = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    facts = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")),
        )
        .select("o_custkey", "l_extendedprice", "l_discount")
    )
    return (
        facts.join(F.broadcast(dims), facts.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


_ORACLE_REVENUE_BY_NATION = """
SELECT r_name, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY r_name, n_name
ORDER BY revenue DESC, n_name ASC
"""


# --------------------------------------------------------------------------
# Pricing summary (TPC-H Q1 shape): multi-agg groupBy
# --------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"),
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            _dsum(disc_price, "sum_disc_price"),
            _dsum(charge, "sum_charge"),
            (F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
             / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# Top-k orders by revenue (TakeOrderedAndProject)
# --------------------------------------------------------------------------

def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


_ORACLE_TOP_ORDERS = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# Reshape: melt / unpivot
# --------------------------------------------------------------------------

def q_melt_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return melt(
        li,
        id_vars=["l_orderkey", "l_linenumber"],
        value_vars=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        var_name="measure",
        value_name="value",
    )


_ORACLE_MELT_LINEITEM = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
"""


# --------------------------------------------------------------------------
# Filters / recodes
# --------------------------------------------------------------------------

def q_filter_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return filter_out_values(ev, "event_type", ["click", "view"], keep_nulls=True).select(
        "event_id", "user_id", "event_type", "value",
    )


_ORACLE_FILTER_EVENTS = """
SELECT event_id, user_id, event_type, value
FROM events
WHERE event_type IS NULL OR event_type NOT IN ('click', 'view')
"""


def q_map_region_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    return map_column_values(
        region,
        {"EUROPE": "EU", "AMERICA": "AM", "ASIA": "AS"},
        "r_name",
        "r_short",
    ).select("r_regionkey", "r_name", "r_short")


_ORACLE_MAP_REGION_NAMES = """
SELECT r_regionkey, r_name,
       CASE r_name WHEN 'EUROPE' THEN 'EU' WHEN 'AMERICA' THEN 'AM'
                   WHEN 'ASIA' THEN 'AS' ELSE r_name END AS r_short
FROM region
"""


# --------------------------------------------------------------------------
# Windows: top-k per group, deterministic dedup, first obs
# --------------------------------------------------------------------------

def q_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    w = get_window_spec(
        partition_cols="p_brand",
        order_cols=[F.col("p_retailprice").desc(), F.col("p_partkey").asc()],
    )
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
    )


_ORACLE_TOP_PARTS_PER_BRAND = """
SELECT p_brand, p_partkey, p_retailprice, rn
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
  FROM part
)
WHERE rn <= 3
"""


def q_first_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    deduped = drop_duplicates_reproducible(
        orders.withColumn(
            "__key__",
            F.struct(F.col("o_orderdate"), F.col("o_orderkey")),
        ),
        col="o_custkey",
        id_col="__key__",
    )
    return deduped.select("o_custkey", "o_orderkey", "o_orderdate")


_ORACLE_FIRST_ORDER_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_orderdate
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Aggregations: exact median, weighted & geometric averages
# --------------------------------------------------------------------------

def q_median_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    return (
        customer.groupBy("c_mktsegment")
        .agg(
            F.round(exact_median("c_acctbal"), 6).alias("median_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )


_ORACLE_MEDIAN_ACCTBAL = """
SELECT c_mktsegment,
       ROUND(MEDIAN(c_acctbal), 6) AS median_acctbal,
       COUNT(*) AS n_customers
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q_weighted_avg_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    joined = join_multi_dfs(
        [
            customer.withColumnRenamed("c_custkey", "o_custkey"),
            per_cust,
        ],
        on="o_custkey",
        how="inner",
    ).join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    shared = joined.withColumn(
        "w_share", get_weight_shares(F.col("n_orders").cast("double"), "n_name"),
    )
    return (
        shared.groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("c_acctbal") * F.col("w_share")), 6).alias("wavg_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy("n_name")
    )


_ORACLE_WEIGHTED_AVG_ACCTBAL = """
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
), shared AS (
  SELECT n_name, c_acctbal,
         CAST(n_orders AS DOUBLE)
           / SUM(CAST(n_orders AS DOUBLE)) OVER (PARTITION BY n_name) AS w_share
  FROM customer
  JOIN per_cust ON c_custkey = o_custkey
  JOIN nation ON c_nationkey = n_nationkey
)
SELECT n_name,
       ROUND(SUM(c_acctbal * w_share), 6) AS wavg_acctbal,
       COUNT(*) AS n_customers
FROM shared
GROUP BY n_name
ORDER BY n_name
"""


def q_geometric_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_retailprice") > 0)
    return (
        part.groupBy("p_brand")
        .agg(
            F.round(unweighted_geometric_average("p_retailprice", strict=False), 6)
            .alias("geo_avg_price"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .orderBy("p_brand")
    )


_ORACLE_GEOMETRIC_AVG_PRICE = """
SELECT p_brand,
       ROUND(EXP(AVG(LN(p_retailprice))), 6) AS geo_avg_price,
       COUNT(*) AS n_parts
FROM part
WHERE p_retailprice > 0
GROUP BY p_brand
ORDER BY p_brand
"""


# --------------------------------------------------------------------------
# Event-time windows & sessionization (streaming-ready, batch-checked)
# --------------------------------------------------------------------------

def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return tumbling_window_agg(
        ev,
        ts_col="ts",
        duration="1 hour",
        aggs={
            "n_events": F.count(F.lit(1)),
            "sum_value": F.sum(F.col("value").cast("decimal(38,6)")).cast("double"),
        },
        keys=["event_type"],
    ).orderBy("window_start", "event_type")


_ORACLE_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
"""


def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    sess = sessionize_by_gap(ev, "ts", "user_id", gap_seconds=1800.0)
    return (
        sess.groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


_ORACLE_USER_SESSIONS = """
WITH gaps AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
)
SELECT user_id, SUM(is_new) AS n_sessions, COUNT(*) AS n_events
FROM gaps
GROUP BY user_id
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# Set ops: union by name with NULL padding
# --------------------------------------------------------------------------

def q_union_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("party_id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.lit("customer").alias("kind"),
    )
    supplier = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("party_id"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    return union_mismatched_dfs([customer, supplier])


_ORACLE_UNION_PARTIES = """
SELECT c_custkey AS party_id, c_name AS name, c_acctbal AS acctbal,
       c_mktsegment AS mktsegment, 'customer' AS kind
FROM customer
UNION ALL
SELECT s_suppkey, s_name, s_acctbal, NULL, 'supplier'
FROM supplier
"""


# --------------------------------------------------------------------------
# Text analysis on documents
# --------------------------------------------------------------------------

def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    stats = with_text_stats(docs, "text")
    return stats.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("mean_token_len", 6).alias("mean_token_len"),
    )


_ORACLE_DOC_STATS = r"""
WITH toks AS (
  SELECT doc_id, lang, text,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\s+') END AS tok
  FROM documents
)
SELECT doc_id, lang,
       len(tok) AS n_tokens,
       ROUND((length(text) - length(regexp_replace(text, '[\.,;:!\?''"()\[\]{}-]', '', 'g')))
             / CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END, 6) AS punct_ratio,
       ROUND(CASE WHEN len(tok) = 0 THEN 0.0
                  ELSE CAST(list_sum(list_transform(tok, t -> length(t))) AS DOUBLE) / len(tok)
             END, 6) AS mean_token_len
FROM toks
"""


def q_doc_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    deduped = exact_dedup(docs, "text", "doc_id")
    return deduped.select("doc_id", "lang", "source", "n_chars")


_ORACLE_DOC_DEDUP_EXACT = r"""
SELECT doc_id, lang, source, n_chars
FROM (
  SELECT doc_id, lang, source, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
           ORDER BY doc_id ASC) AS rn
  FROM documents
)
WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Similarity search: exact cosine top-k
# --------------------------------------------------------------------------

def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    topk = brute_force_topk(queries_df, emb, k=5)
    return topk.select(
        "query_id",
        "candidate_id",
        F.round("cosine", 6).alias("cosine"),
    ).orderBy("query_id", F.col("cosine").desc(), "candidate_id")


_ORACLE_COSINE_TOPK = """
WITH pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS candidate_id,
         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                CAST(c.embedding AS DOUBLE[])) AS cos
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
)
SELECT query_id, candidate_id, ROUND(cos, 6) AS cosine
FROM (
  SELECT query_id, candidate_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, candidate_id ASC) AS rn
  FROM pairs
)
WHERE rn <= 5
ORDER BY query_id, cosine DESC, candidate_id
"""


# --------------------------------------------------------------------------
# As-of join (events: attach each user's latest signup before a purchase)
# --------------------------------------------------------------------------

def q_asof_purchase_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
    )
    signups = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("view_value"),
    )
    joined = asof_join(
        purchases, signups, on="ts", by="user_id", direction="backward",
    )
    return joined.select("event_id", "user_id", "view_value").orderBy("event_id")


_ORACLE_ASOF_PURCHASE_SIGNUP = """
SELECT p.event_id, p.user_id, v.view_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts, value AS view_value
                FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
ORDER BY p.event_id
"""


# --------------------------------------------------------------------------
# Contract functions
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_revenue_by_nation(spark, SF_DEFAULT)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "revenue_by_nation": q_revenue_by_nation,
        "pricing_summary": q_pricing_summary,
        "top_orders": q_top_orders,
        "melt_lineitem": q_melt_lineitem,
        "filter_events": q_filter_events,
        "map_region_names": q_map_region_names,
        "top_parts_per_brand": q_top_parts_per_brand,
        "first_order_per_customer": q_first_order_per_customer,
        "median_acctbal": q_median_acctbal,
        "weighted_avg_acctbal": q_weighted_avg_acctbal,
        "geometric_avg_price": q_geometric_avg_price,
        "events_hourly": q_events_hourly,
        "user_sessions": q_user_sessions,
        "union_parties": q_union_parties,
        "doc_stats": q_doc_stats,
        "doc_dedup_exact": q_doc_dedup_exact,
        "cosine_topk": q_cosine_topk,
        "asof_purchase_signup": q_asof_purchase_signup,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "revenue_by_nation": _ORACLE_REVENUE_BY_NATION,
        "pricing_summary": _ORACLE_PRICING_SUMMARY,
        "top_orders": _ORACLE_TOP_ORDERS,
        "melt_lineitem": _ORACLE_MELT_LINEITEM,
        "filter_events": _ORACLE_FILTER_EVENTS,
        "map_region_names": _ORACLE_MAP_REGION_NAMES,
        "top_parts_per_brand": _ORACLE_TOP_PARTS_PER_BRAND,
        "first_order_per_customer": _ORACLE_FIRST_ORDER_PER_CUSTOMER,
        "median_acctbal": _ORACLE_MEDIAN_ACCTBAL,
        "weighted_avg_acctbal": _ORACLE_WEIGHTED_AVG_ACCTBAL,
        "geometric_avg_price": _ORACLE_GEOMETRIC_AVG_PRICE,
        "events_hourly": _ORACLE_EVENTS_HOURLY,
        "user_sessions": _ORACLE_USER_SESSIONS,
        "union_parties": _ORACLE_UNION_PARTIES,
        "doc_stats": _ORACLE_DOC_STATS,
        "doc_dedup_exact": _ORACLE_DOC_DEDUP_EXACT,
        "cosine_topk": _ORACLE_COSINE_TOPK,
        "asof_purchase_signup": _ORACLE_ASOF_PURCHASE_SIGNUP,
    }
