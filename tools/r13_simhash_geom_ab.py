"""Round-13 experiment: simhash_near_dups block-geometry A/B at the
bench SF. The output is IDENTICAL for every B (pigeonhole theorem,
pinned by tests), so this is purely a cost question: the round-6 sweep
measured B=7 optimal at sf10 but the <=16 MB scan-bytes gate
short-circuits small corpora to the classic B=d+1=4 — which SCALE.md
records at 27.5M candidate rows for 5k docs. Does the measured
key_bits ~ log2(N)+13 rule also win at sf0.1?

Interleaved sweeps, min/median per variant.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    blocks = [int(b) for b in (sys.argv[1:] or ["4", "5", "6", "7"])]

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.operators import dedup as D
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

    spark = get_session("r13-simhash-ab", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    samples: dict[int, list[float]] = {b: [] for b in blocks}
    counts: dict[int, int] = {}
    for _ in range(reps):
        for b in blocks:
            spark.sparkContext.setJobDescription(f"simhash_near_dups B={b}")
            t0 = time.perf_counter()
            df = D.simhash_near_dups(docs, max_distance=3, n_blocks=b)
            df.write.format("noop").mode("overwrite").save()
            samples[b].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    # row-set equality across geometries (cheap at this SF)
    base = D.simhash_near_dups(docs, max_distance=3, n_blocks=blocks[0])
    for b in blocks:
        counts[b] = D.simhash_near_dups(docs, max_distance=3, n_blocks=b).count()
        spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "reps": reps,
                "min": {b: round(min(ts), 3) for b, ts in samples.items()},
                "median": {b: round(statistics.median(ts), 3) for b, ts in samples.items()},
                "rows": counts,
            }
        )
    )


if __name__ == "__main__":
    main()
