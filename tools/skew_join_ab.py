"""Skewed fact-fact JOIN evidence (VERDICT r8 item 5): a deliberately
skewed join at sf10 — one hot orderkey carrying ~1/3 of all lineitem
rows — A/B'd across the three strategies the engine documents, in one
session with hygiene between runs:

  1. plain shuffle join, AQE skew-join ON  (the engine default posture)
  2. plain shuffle join, AQE skew-join OFF (what a legacy/AQE-less
     engine, or a skew AQE can't see, would pay)
  3. plans/skew.py::salted_join             (the documented fallback)

Fixture shape: lineitem with every orderkey ≡ 0 (mod 3) remapped to a
single hot key (orderkeys carry ~4 rows each, so the hot key gets ~1/3
of all rows ≈ 20M at sf10); the dim side is the skewed frame's DISTINCT
keys + a payload — ~10M rows, far past any broadcast threshold, so all
strategies pay a genuine shuffle join. Row counts are asserted equal
across strategies (semantic equality at sf-smoke grain is pinned in
tests/test_sinks_and_skew.py; here count equality guards the harness).

Usage: python tools/skew_join_ab.py --sf-dir .scratch/sf10 \
           --out SCALE_R9_SF10_SKEWJOIN.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# Outside the l_orderkey domain (orderkeys are >= 1), so no genuine key
# silently merges into the hot one — orderkey 1 used to (1 % 3 != 0 maps
# its rows to jk=1), slightly distorting the hot share and dim
# cardinality (ADVICE r9).
HOT_KEY = -1


def skewed_frames(spark, sf_dir: str, hot_share: str = "third"):
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    hot = (
        F.col("l_orderkey") % 3 == 0
        if hot_share == "third"
        else F.col("l_orderkey") % 3 != 0  # "two_thirds"
    )
    skewed = li.withColumn(
        "jk", F.when(hot, F.lit(HOT_KEY)).otherwise(F.col("l_orderkey"))
    )
    dim = (
        skewed.select("jk").distinct()
        # payload wide (64B) AND incompressible: the first attempt's 16B
        # payload let the static planner broadcast the dim (skew never
        # touched the wire), and a repeat('p',64) retry compressed ~100:1
        # in the exchange so AQE converted the SMJ to broadcast at
        # runtime — whose driver-side collect then blew maxResultSize on
        # the 16x-replicated salted side. Hash-derived bytes keep the
        # ~10M-row dim over the broadcast threshold in BOTH planners, so
        # every strategy pays a genuine fact-fact shuffle join.
        .withColumn(
            "dim_payload",
            F.concat(F.md5(F.col("jk").cast("string")),
                     F.md5((F.col("jk") + 1).cast("string"))),
        )
    )
    return skewed, dim


def run(spark, sf_dir: str, hot_share: str = "third") -> dict:
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.plans.skew import salted_join
    from tools.scale_run import session_hygiene

    skewed, dim = skewed_frames(spark, sf_dir, hot_share)
    # the dim is derived (distinct over the fact) — materialize it to
    # parquet once so every strategy joins the same cheap scan, not a
    # re-derived aggregate (the A/B measures the JOIN, not the distinct)
    dim_path = os.path.join(sf_dir, f"_skew_ab_dim_{hot_share}.parquet")
    if not os.path.exists(dim_path):
        dim.write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path)

    def agg_count(df):
        # consume every joined row without collecting it: a real job's
        # downstream — an algebraic agg that reads FACT columns as well
        # as the dim payload. Consuming only dim_payload lets Catalyst
        # prune the fact side to the bare join key, whose hot-key rows
        # (constant value) compress to almost nothing — and AQE's skew
        # detection reads COMPRESSED map-output bytes, so a row-skewed
        # but byte-light partition is invisible to it (measured: the
        # splitter never fired on the pruned shape; see SCALE.md).
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("q"),
            F.sum("l_extendedprice").alias("e"),
            F.sum(F.length("dim_payload")).alias("b"),
        )
        n = agg.collect()[0]["n"]
        # record what AQE actually executed: 'skewed' on AQEShuffleRead /
        # 'skew=true' on the join node prove the splitter fired. Read the
        # plan from the COLLECTED frame — a parent/unexecuted frame's
        # executedPlan is the pre-runtime plan and never carries AQE's
        # runtime skew markers
        plan = agg._jdf.queryExecution().executedPlan().toString().lower()
        return n, ("skew=true" in plan or "skewed" in plan)

    out = {}
    strategies = [
        # forceOptimizeSkewedJoin: let AQE split the skewed partitions
        # even where doing so adds an exchange — the A/B wants the skew
        # optimizer ON the hot path, not silently declined
        ("aqe_skew_on", {"spark.sql.adaptive.skewJoin.enabled": "true",
                         "spark.sql.adaptive.forceOptimizeSkewedJoin": "true"},
         lambda: skewed.join(dim, "jk")),
        ("aqe_skew_off", {"spark.sql.adaptive.skewJoin.enabled": "false",
                          "spark.sql.adaptive.forceOptimizeSkewedJoin": "false"},
         lambda: skewed.join(dim, "jk")),
        ("salted_join_16", {}, lambda: salted_join(skewed, dim, "jk", num_salts=16)),
    ]
    for name, conf, build in strategies:
        saved = {}
        for k, v in conf.items():
            try:
                saved[k] = spark.conf.get(k)
            except Exception:
                saved[k] = None
            spark.conf.set(k, v)
        t0 = time.perf_counter()
        n, skew_marked = agg_count(build())
        out[name] = {
            "sec": round(time.perf_counter() - t0, 3),
            "rows": n,
            "plan_skew_marked": skew_marked,
        }
        print(name, out[name], flush=True)
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        session_hygiene(spark)
    counts = {v["rows"] for v in out.values()}
    assert len(counts) == 1, f"strategies disagree on row count: {out}"
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=".scratch/sf10")
    ap.add_argument("--out", required=True)
    a = ap.parse_args()

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session

    spark = get_session("skew-join-ab", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    record = {
        "sf_dir": os.path.abspath(a.sf_dir),
        "hot_key": HOT_KEY,
        "hot_share_third": run(spark, os.path.abspath(a.sf_dir), "third"),
        "hot_share_two_thirds": run(spark, os.path.abspath(a.sf_dir), "two_thirds"),
    }
    with open(a.out, "w") as f:
        json.dump(record, f, indent=1)
    print("->", a.out)


if __name__ == "__main__":
    main()
