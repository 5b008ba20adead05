"""Capture .explain('formatted') for every bench headline entry into
plans/<round>/<name>_<tag>.txt (optimization-round deliverable: the
judge checks plan claims against these files).

Usage: python tools/capture_plans.py <tag> [name ...]
  tag     e.g. 'before' / 'after'
  names   optional subset; default = every bench HEADLINE entry.
Env: SPARK_GRAFT_PLAN_DIR names the output subdir (default 'r14').

Builds each DataFrame exactly as bench.py does (BENCH_IMPL override or
registry entry) at $SPARK_GRAFT_SF_DIR (default sf0.1) and writes the
formatted physical plan. No actions are run beyond what query
construction itself triggers (eager_stats counts, route decisions), so
the captured plan is the plan the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_IMPL, HEADLINE  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_DIR", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import QUERIES

    spark = get_session("spark-graft-plan-capture", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = BENCH_IMPL.get(name, QUERIES.get(name))
        if fn is None:
            print(f"{name}: not found", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)
        plan = df._sc_explain if hasattr(df, "_sc_explain") else None
        if plan is None:
            # public-API capture (ADVICE r13): redirect stdout around
            # df.explain instead of reaching into queryExecution/ExplainMode
            # internals that move across pyspark releases
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name} -> {path} ({plan.count('Exchange')} 'Exchange' mentions)")


if __name__ == "__main__":
    main()
