"""Events-only sf100 fixture (VERDICT r8 item 4): replicate the sf10
events table 10x with tools/make_scale.py's exact replica semantics —
event_id shifted by the table stride, user_id KEPT (the same user
population generating 10x denser traffic, so streaming state keys stay
constant across decades — the realistic way an event stream scales),
ts jittered +i µs per replica so (user_id, ts) stays unique and
order-sensitive operators stay deterministic.

Only events.parquet is written: the streaming evidence suite reads
nothing else, and the full-table sf100 fixture would cost ~10 GB for
tables no streaming workload touches.

Usage: python tools/make_events_sf100.py --src .scratch/sf10 \
           --out .scratch/sf100_events
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 10


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=".scratch/sf10")
    ap.add_argument("--out", default=".scratch/sf100_events")
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
    spark = get_session("events-sf100", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, src, "events")
    # _replica unpacks every TPC-H stride up front; only the events
    # stride is consumed for this table — zero-fill the rest
    strides = {t: 0 for t in ("customer", "supplier", "part", "orders", "lineitem")}
    strides["events"] = ev.count()
    full = _replica("events", ev, 0, strides)
    for i in range(1, K):
        full = full.unionByName(_replica("events", ev, i, strides))
    _write_single_file(full, out, "events")
    open(marker, "w").close()
    print("events x", K, "->", out)


if __name__ == "__main__":
    main()
