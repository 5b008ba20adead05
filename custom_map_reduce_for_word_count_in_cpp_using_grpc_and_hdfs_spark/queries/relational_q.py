"""Relational coverage queries: projections, filters, joins (all types),
aggregation suite, TPC-H-flavored analytics over the star schema.

Every double aggregate uses the decimal-sum pattern from
``functions.exact`` so Spark and the DuckDB oracle agree bit-for-bit
regardless of aggregation order (see that module's docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.functions.exact import davg, dsum, dsum_expr
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators.relational import top_n
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import query
from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


# --------------------------------------------------------------------------
# TPC-H-flavored analytics (joins + aggregates together, the bench headliners)
# --------------------------------------------------------------------------


@query(
    "rel_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_expr('l_quantity')} AS sum_qty,
           {dsum_expr('l_extendedprice')} AS sum_base_price,
           {dsum_expr('l_extendedprice * (1 - l_discount)', 6)} AS sum_disc_price,
           {dsum_expr('(l_extendedprice * (1 - l_discount)) * (1 + l_tax)', 6)} AS sum_charge,
           {dsum_expr('l_quantity')} / count(l_quantity) AS avg_qty,
           {dsum_expr('l_extendedprice')} / count(l_extendedprice) AS avg_price,
           {dsum_expr('l_discount')} / count(l_discount) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def rel_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregate — the canonical
    partial/final hash-agg plan; the filter pushes to the parquet scan."""
    (li,) = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", alias="sum_qty"),
            dsum("l_extendedprice", alias="sum_base_price"),
            dsum(disc_price, 6, alias="sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax")), 6, alias="sum_charge"),
            davg("l_quantity", alias="avg_qty"),
            davg("l_extendedprice", alias="avg_price"),
            davg("l_discount", alias="avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "rel_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {dsum_expr('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def rel_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → broadcast join into the fact
    chain → grouped revenue → top-10. Customer broadcasts; the
    orders↔lineitem join shuffles on orderkey (co-partitioned keys)."""
    li, o, c = _t(spark, sf_dir, "lineitem", "orders", "customer")
    building = c.where(F.col("c_mktsegment") == "BUILDING")
    joined = (
        o.where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .join(F.broadcast(building), o.o_custkey == building.c_custkey)
        .join(
            li.where(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(revenue, 6, alias="revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@query(
    "rel_q5_region_revenue",
    oracle=f"""
    SELECT n.n_name,
           {dsum_expr('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n.n_name
    """,
)
def rel_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: five-way star join, every dimension broadcast, one
    fact-fact shuffle join (orders↔lineitem)."""
    li, o, c, s, n, r = _t(spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region")
    asia_nations = (
        n.join(F.broadcast(r.where(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    joined = (
        o.where(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy("n_name").agg(dsum(revenue, 6, alias="revenue"))


# --------------------------------------------------------------------------
# Join-type coverage
# --------------------------------------------------------------------------


@query(
    "rel_join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def rel_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = _t(spark, sf_dir, "orders", "customer")
    return (
        o.where(F.col("o_orderstatus") == "F")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")
    )


@query(
    "rel_join_left_outer",
    oracle="""
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
           CAST(SUM(CAST(COALESCE(o.o_totalprice, 0) AS DECIMAL(27,4))) AS DOUBLE) AS total_spent
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def rel_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer keeps order-less customers with n_orders = 0."""
    o, c = _t(spark, sf_dir, "orders", "customer")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum(F.coalesce(F.col("o_totalprice"), F.lit(0.0)), alias="total_spent"),
        )
    )


@query(
    "rel_join_right_outer",
    oracle="""
    SELECT o.o_orderkey, c.c_name
    FROM customer c RIGHT JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey % 100 = 0
    """,
)
def rel_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = _t(spark, sf_dir, "orders", "customer")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "right")
        .where(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", "c_name")
    )


@query(
    "rel_join_full_outer",
    oracle="""
    SELECT a.event_type AS t1, b.event_type AS t2, a.cnt AS cnt1, b.cnt AS cnt2
    FROM (SELECT event_type, count(*) AS cnt FROM events WHERE value < 100 GROUP BY event_type) a
    FULL JOIN (SELECT event_type, count(*) AS cnt FROM events WHERE value >= 400 GROUP BY event_type) b
      ON a.event_type = b.event_type
    """,
)
def rel_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    (e,) = _t(spark, sf_dir, "events")
    a = (
        e.where(F.col("value") < 100)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .alias("a")
    )
    b = (
        e.where(F.col("value") >= 400)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .alias("b")
    )
    return a.join(b, F.col("a.event_type") == F.col("b.event_type"), "full").select(
        F.col("a.event_type").alias("t1"),
        F.col("b.event_type").alias("t2"),
        F.col("a.cnt").alias("cnt1"),
        F.col("b.cnt").alias("cnt2"),
    )


@query(
    "rel_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def rel_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: customers having a >400k order; no row multiplication."""
    o, c = _t(spark, sf_dir, "orders", "customer")
    big = o.where(F.col("o_totalprice") > 400000)
    return c.join(big, big.o_custkey == c.c_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "rel_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def rel_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: customers with no orders at all."""
    o, c = _t(spark, sf_dir, "orders", "customer")
    return c.join(o, o.o_custkey == c.c_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "rel_join_cross",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
)
def rel_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join — only ever sane between tiny broadcast relations."""
    n, r = _t(spark, sf_dir, "nation", "region")
    return r.crossJoin(F.broadcast(n)).select("r_name", "n_name")


@query(
    "rel_self_join_range",
    oracle="""
    SELECT a.n_nationkey AS nk_a, b.n_nationkey AS nk_b
    FROM nation a JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def rel_self_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join with an inequality conjunct (theta-join surface)."""
    (n,) = _t(spark, sf_dir, "nation")
    a, b = n.alias("a"), n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(F.col("a.n_nationkey").alias("nk_a"), F.col("b.n_nationkey").alias("nk_b"))


# --------------------------------------------------------------------------
# Aggregation suite
# --------------------------------------------------------------------------


@query(
    "rel_agg_suite",
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS n_rows,
           count(DISTINCT l_partkey) AS n_parts,
           {dsum_expr('l_quantity')} AS sum_qty,
           min(l_quantity) AS min_qty,
           max(l_quantity) AS max_qty,
           {dsum_expr('l_extendedprice')} / count(l_extendedprice) AS avg_price,
           min(l_shipdate) AS first_ship,
           max(l_shipdate) AS last_ship
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def rel_agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_partkey").alias("n_parts"),
        dsum("l_quantity", alias="sum_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        davg("l_extendedprice", alias="avg_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@query(
    "rel_agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 12
    """,
)
def rel_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    (o,) = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 12)
    )


@query(
    "rel_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, count(*) AS cnt, {dsum_expr('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals: (flag,status), (flag), ()."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"), dsum("l_quantity", alias="sum_qty")
    )


@query(
    "rel_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
           {dsum_expr('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    (o,) = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice", alias="sum_price")
    )


@query(
    "rel_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {dsum_expr('l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
    ).agg(dsum("l_extendedprice", alias="sum_price"))


@query("rel_approx_count_distinct")  # approximate → rows-only driver check
def rel_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB substitute for exact
    COUNT(DISTINCT) when a 2% error is acceptable (single pass, no
    count-distinct expansion). Tested for accuracy vs exact in tests/."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


# --------------------------------------------------------------------------
# Projection / filter / distinct / sort / set ops
# --------------------------------------------------------------------------


@query(
    "rel_project_filter",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice * 0.9 AS sale_price
    FROM part
    WHERE p_size >= 30 AND p_type LIKE '%BRASS%'
    """,
)
def rel_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + predicate — both must reach the parquet scan
    (PushedFilters / ReadSchema; asserted in tests/test_plans.py)."""
    (p,) = _t(spark, sf_dir, "part")
    return (
        p.where((F.col("p_size") >= 30) & F.col("p_type").contains("BRASS"))
        .select("p_partkey", "p_name", (F.col("p_retailprice") * 0.9).alias("sale_price"))
    )


@query(
    "rel_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def rel_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "rel_drop_duplicates_subset",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def rel_drop_duplicates_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep one row per key with a *deterministic* survivor. Spark's bare
    dropDuplicates keeps an arbitrary row — fine for idempotent dedup,
    wrong for differential testing — so the engine's canonical form is
    the row_number window."""
    from pyspark.sql import Window

    (o,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "rel_sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def rel_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    (o,) = _t(spark, sf_dir, "orders")
    return top_n(o.select("o_orderkey", "o_totalprice"), 25, F.col("o_totalprice").desc(), F.col("o_orderkey").asc())


@query(
    "rel_union_all",
    oracle="""
    SELECT c_custkey AS custkey, 'building' AS tag FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey AS custkey, 'rich' AS tag FROM customer WHERE c_acctbal > 9000
    """,
)
def rel_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    (c,) = _t(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey"), F.lit("building").alias("tag")
    )
    b = c.where(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("custkey"), F.lit("rich").alias("tag")
    )
    return a.unionAll(b)


@query(
    "rel_intersect",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    """,
)
def rel_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = _t(spark, sf_dir, "orders", "customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("custkey"))
    b = o.where(F.col("o_totalprice") > 300000).select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@query(
    "rel_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def rel_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, c = _t(spark, sf_dir, "orders", "customer")
    a = c.select(F.col("c_custkey").alias("custkey"))
    b = o.where(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return a.subtract(b)


# --------------------------------------------------------------------------
# Subqueries
# --------------------------------------------------------------------------


@query(
    "rel_subquery_in",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    """,
)
def rel_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery — planned as a left-semi join (broadcast here)."""
    o, c = _t(spark, sf_dir, "orders", "customer")
    debtors = c.where(F.col("c_acctbal") < 0).select("c_custkey")
    return o.join(
        F.broadcast(debtors), o.o_custkey == debtors.c_custkey, "left_semi"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "rel_correlated_above_avg",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM (
        SELECT o_orderkey, o_custkey, o_totalprice,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) OVER (PARTITION BY o_custkey) AS DOUBLE)
                 / count(*) OVER (PARTITION BY o_custkey) AS cust_avg
        FROM orders
    ) WHERE o_totalprice > cust_avg
    """,
)
def rel_correlated_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decorrelated 'above the per-customer average' — one window pass, no
    self-join (what Catalyst rewrites a correlated scalar subquery into)."""
    from pyspark.sql import Window

    (o,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    cust_avg = (
        F.sum(F.col("o_totalprice").cast("decimal(27,4)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        o.withColumn("cust_avg", cust_avg)
        .where(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
