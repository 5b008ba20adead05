"""Round-13: connected_components route A/B — distributed hash-min loop
vs driver-local numpy union-find, at two edge scales from the real
operators: the pipeline-shaped exact-Jaccard edges (~2k at sf0.1) and
the simhash near-dup pairs (~2.09M at sf0.1, near the route cap).
Row-set equality asserted; interleaved reps, minima reported.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import dedup as D
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries.dedup_q import JACCARD_T
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

    spark = get_session("r13-cc-ab", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    docs = load_table(spark, sf_dir, "documents")
    verts = docs.select("doc_id")

    # materialize both edge sets ONCE outside the timed region (the edge
    # generators are what the pipeline pays; this A/B times the
    # component labeling alone)
    jac = D.jaccard_pairs(docs, JACCARD_T, max_shingle_df=20).select("doc_a", "doc_b")
    jac = jac.persist()
    n_jac = jac.count()
    sim = D.simhash_near_dups(docs, max_distance=3).select("doc_a", "doc_b")
    sim = sim.persist()
    n_sim = sim.count()

    cases = {"jaccard_edges": jac, "simhash_edges": sim}
    samples: dict[str, list[float]] = {}
    for name, edges in cases.items():
        for route in ("loop", "driver"):
            samples[f"{name}:{route}"] = []
    for _ in range(reps):
        for name, edges in cases.items():
            for route in ("loop", "driver"):
                spark.sparkContext.setJobDescription(f"cc {name} {route}")
                t0 = time.perf_counter()
                D.connected_components(
                    verts, edges, id_col="doc_id", src_col="doc_a", dst_col="doc_b",
                    route=route,
                ).write.format("noop").mode("overwrite").save()
                samples[f"{name}:{route}"].append(time.perf_counter() - t0)
    # row equality between routes
    eq = {}
    for name, edges in cases.items():
        l = D.connected_components(verts, edges, id_col="doc_id", src_col="doc_a",
                                   dst_col="doc_b", route="loop")
        r = D.connected_components(verts, edges, id_col="doc_id", src_col="doc_a",
                                   dst_col="doc_b", route="driver")
        eq[name] = l.exceptAll(r).count() == 0 and r.exceptAll(l).count() == 0
    print(
        json.dumps(
            {
                "n_edges": {"jaccard_edges": n_jac, "simhash_edges": n_sim},
                "routes_equal": eq,
                "min": {k: round(min(v), 3) for k, v in samples.items()},
                "median": {k: round(statistics.median(v), 3) for k, v in samples.items()},
                "reps": reps,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
