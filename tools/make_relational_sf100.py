"""Relational-only sf100 fixture (VERDICT r9 item 4): replicate the sf10
TPC-H tables 10x with tools/make_scale.py's exact replica semantics —
keys shifted by the table stride so every FK relationship is preserved
and the shifted key spaces stay disjoint.

Only the tables the relational decade targets read are written
(customer, supplier, part, orders, lineitem — lineitem lands at ~600M
rows / ~11 GB; region/nation are the fixed-cardinality shared
dimensions, copied once). documents/embeddings/events are skipped: the
dedup/similarity families already carry their own sf100 fixtures
(tools/sf100_dedup.py) and events has make_events_sf100.py — writing
them here would cost ~20 GB for tables no relational query touches.

Usage: python tools/make_relational_sf100.py --src .scratch/sf10 \
           --out .scratch/sf100_rel
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 10
REPLICATED = ("customer", "supplier", "part", "orders", "lineitem")
SHARED = ("region", "nation")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=".scratch/sf10")
    ap.add_argument("--out", default=".scratch/sf100_rel")
    a = ap.parse_args()
    src, out = os.path.abspath(a.src), os.path.abspath(a.out)

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table
    from tools.make_scale import _replica, _write_single_file

    marker = os.path.join(out, "_SCALED_OK")
    if os.path.exists(marker):
        print("fixture already staged:", out)
        return
    os.makedirs(out, exist_ok=True)
    spark = get_session("relational-sf100", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    # strides must equal the source row counts for disjoint key spaces
    strides = {t: load_table(spark, src, t).count() for t in REPLICATED}
    strides["events"] = 0  # unused; _replica unpacks it
    print("strides:", strides, flush=True)

    for t in SHARED:
        _write_single_file(load_table(spark, src, t), out, t)
        print(t, "copied", flush=True)
    for t in REPLICATED:
        base = load_table(spark, src, t)
        full = base
        for i in range(1, K):
            full = full.unionByName(_replica(t, base, i, strides))
        _write_single_file(full, out, t)
        print(t, "x", K, "written", flush=True)
    open(marker, "w").close()
    print("->", out)


if __name__ == "__main__":
    main()
