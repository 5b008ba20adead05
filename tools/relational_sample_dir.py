"""Build a RELATIONAL sampled dir for large-SF oracle checks (VERDICT r6
item 4): orders and lineitem sliced consistently by o_orderkey % k
(children follow parents, so join cardinalities stay realistic), events
by event_id % k, every other table symlinked at full scale. Registry
queries and oracles then run UNCHANGED against the dir via
tools/scale_run.py --sf-dir <out> --only ... — the sample keeps sf10's
value distributions and date ranges while keeping the driver-side
row-for-row compare (join suite ~1M rows, window suite ~1M rows at
k=10) at the already-proven sf1 compare scale.

Usage: python tools/relational_sample_dir.py --sf-dir .scratch/sf10 [--k 10]
       (prints the sampled dir path)
"""
from __future__ import annotations

import argparse
import os


def make_relational_sampled_dir(sf_dir: str, k: int) -> str:
    import duckdb

    out = os.path.join(sf_dir, f"_rel_sampled_mod{k}")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    slices = {
        "orders": f"SELECT * FROM '{sf_dir}/orders.parquet' WHERE o_orderkey % {k} = 0",
        "lineitem": f"SELECT * FROM '{sf_dir}/lineitem.parquet' WHERE l_orderkey % {k} = 0",
        "events": f"SELECT * FROM '{sf_dir}/events.parquet' WHERE event_id % {k} = 0",
    }
    for t, q in slices.items():
        src = os.path.join(sf_dir, f"{t}.parquet")
        target = os.path.join(out, f"{t}.parquet")
        # tolerate partial fixtures (e.g. the relational-only sf100 dir
        # omits events/documents/embeddings by design — round 10)
        if os.path.exists(src) and not os.path.exists(target):
            con.execute(f"COPY ({q}) TO '{target}' (FORMAT PARQUET)")
    for t in ("region", "nation", "customer", "supplier", "part", "documents", "embeddings"):
        src = os.path.join(sf_dir, f"{t}.parquet")
        link = os.path.join(out, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(link):
            os.symlink(src, link)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--k", type=int, default=10)
    a = ap.parse_args()
    print(make_relational_sampled_dir(os.path.abspath(a.sf_dir), a.k))
