"""Window functions, scalar function coverage, and the Pandas-UDF surface
(SURVEY.md §2.3 — all ABSENT in the reference, standard in this engine).

Windowed SUM over doubles is order-sensitive AND some engines compute
sliding frames incrementally (add/remove), so every windowed sum here
uses the same decimal-cast pattern as grouped aggregation.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import query
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@query(
    "win_rank_suite",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           row_number() OVER w AS rn,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def win_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family over one window — single Exchange(nationkey) + sort."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           lag(event_type, 1, 'none') OVER w AS prev_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event sequencing (the sessionization building block)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("event_type", 1, "none").over(w).alias("prev_type"),
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-customer spend — decimal-cast so the running sum is
    exact at every prefix."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col("o_totalprice").cast("decimal(27,4)")).over(w).cast("double")
    return o.select("o_orderkey", "o_custkey", "o_orderdate", running.alias("running_spend"))


@query(
    "win_moving_avg",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(27,4))) OVER w AS DOUBLE)
             / count(value) OVER w AS moving_avg_3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-event moving average per user; decimal sum keeps incremental
    frame evaluation (add/remove one row) exact."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, Window.currentRow)
    )
    avg3 = F.sum(F.col("value").cast("decimal(27,4)")).over(w).cast("double") / F.count("value").over(w)
    return e.select("event_id", "user_id", "ts", avg3.alias("moving_avg_3"))


@query(
    "win_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type) OVER w AS last_type,
           count(*) OVER (PARTITION BY user_id) AS n_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last event per user with full-partition frame (the default
    frame's last_value trap avoided explicitly)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_events"),
    ).distinct()


# --------------------------------------------------------------------------
# Scalar function coverage
# --------------------------------------------------------------------------


@query(
    "fn_string_suite",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           length(p_name) AS name_len,
           substr(p_type, 1, 5) AS type_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           replace(p_name, ' ', '_') AS name_snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           reverse(p_brand) AS brand_rev,
           trim(p_name) AS name_trim
    FROM part
    """,
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len").cast("long"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
        F.trim("p_name").alias("name_trim"),
    )


@query(
    "fn_date_suite",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           CAST(day(o_orderdate) AS BIGINT) AS order_day,
           CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           strftime(o_orderdate, '%Y-%m') AS year_month,
           datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start
    FROM orders
    WHERE o_orderkey % 50 = 0
    """,
)
def fn_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") % 50 == 0).select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("long")
        .alias("days_since_epoch_start"),
    )


@query(
    "fn_math_suite",
    oracle="""
    SELECT c_custkey,
           abs(c_acctbal) AS bal_abs,
           round(c_acctbal, 1) AS bal_round1,
           CAST(floor(c_acctbal) AS DOUBLE) AS bal_floor,
           CAST(ceil(c_acctbal) AS DOUBLE) AS bal_ceil,
           sqrt(abs(c_acctbal)) AS bal_sqrt,
           c_custkey % 7 AS key_mod,
           sign(c_acctbal) AS bal_sign,
           greatest(c_acctbal, 0.0) AS bal_pos,
           least(c_acctbal, 0.0) AS bal_neg
    FROM customer
    """,
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions restricted to the correctly-rounded IEEE set (sqrt,
    abs, floor/ceil, round-half-away) — transcendentals (ln/exp/pow) are
    deliberately excluded from differential testing since libm results
    differ in ULPs across engines."""
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.abs(bal).alias("bal_abs"),
        F.round(bal, 1).alias("bal_round1"),
        F.floor(bal).cast("double").alias("bal_floor"),
        F.ceil(bal).cast("double").alias("bal_ceil"),
        F.sqrt(F.abs(bal)).alias("bal_sqrt"),
        (F.col("c_custkey") % 7).alias("key_mod"),
        F.signum(bal).alias("bal_sign"),
        F.greatest(bal, F.lit(0.0)).alias("bal_pos"),
        F.least(bal, F.lit(0.0)).alias("bal_neg"),
    )


@query(
    "fn_case_bucket",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 9000 THEN 'mid'
                ELSE 'high' END AS bucket,
           count(*) AS n
    FROM customer
    GROUP BY 1
    """,
)
def fn_case_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 9000, "mid")
        .otherwise("high")
    )
    return c.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n"))


@query(
    "fn_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, count(*) AS n,
           min(event_id) AS first_event
    FROM events
    GROUP BY 1
    """,
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (events.props) — the semi-structured
    column surface."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy(k.alias("k")).agg(
        F.count(F.lit(1)).alias("n"), F.min("event_id").alias("first_event")
    )


@query(
    "fn_array_ops",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           embedding[1] AS first_component,
           embedding[64] AS last_component,
           array_to_string(list_transform(list_slice(embedding, 1, 4),
                           x -> CAST(CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT) AS VARCHAR)), ',') AS head4
    FROM embeddings
    WHERE vec_id % 20 = 0
    """,
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array column surface over the embeddings table (1-indexed access
    in both engines; the sliced head is serialized to a scalar string so
    the differential hash never depends on array-encoding details)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # integer basis-points: double→string formatting differs between
    # engines, integer formatting doesn't
    head4 = F.array_join(
        F.transform(
            F.slice("embedding", 1, 4),
            lambda x: F.round(x.cast("double") * 10000).cast("long").cast("string"),
        ),
        ",",
    )
    return emb.where(F.col("vec_id") % 20 == 0).select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).alias("first_component"),
        F.element_at("embedding", 64).alias("last_component"),
        head4.alias("head4"),
    )


# --------------------------------------------------------------------------
# Pandas-UDF surface (Arrow-batched; the engine's sanctioned Python escape
# hatch — never row-at-a-time Python UDFs)
# --------------------------------------------------------------------------


@query(
    "udf_discounted_price",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price
    FROM lineitem
    WHERE l_orderkey % 40 = 0
    """,
)
def udf_discounted_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf: vectorized per-row arithmetic over Arrow batches.
    Bitwise-identical to the SQL expression because both are one IEEE
    multiply chain — demonstrates the fast Python path without value drift."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def disc_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1 - discount)

    li = load_table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_orderkey") % 40 == 0).select(
        "l_orderkey",
        "l_linenumber",
        disc_price("l_extendedprice", "l_discount").alias("disc_price"),
    )


@query(
    "udf_grouped_demean",
    oracle="""
    SELECT c_custkey, c_nationkey,
           c_acctbal - max(c_acctbal) OVER (PARTITION BY c_nationkey) AS bal_vs_best
    FROM customer
    """,
)
def udf_grouped_demean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas (grouped-map): per-nation transform where each group
    becomes one pandas frame. max-relative (not mean-relative) so the
    result is float-exact vs the window-function oracle."""
    c = load_table(spark, sf_dir, "customer")

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["c_custkey", "c_nationkey"]].copy()
        out["bal_vs_best"] = pdf["c_acctbal"] - pdf["c_acctbal"].max()
        return out

    return c.groupBy("c_nationkey").applyInPandas(
        demean, schema="c_custkey long, c_nationkey int, bal_vs_best double"
    )
