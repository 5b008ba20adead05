"""Regenerate the executed-plan blocks in PLANS.md.

PLANS.md is prose + one fenced ``` block of `formatted_plan(execute=True)`
output per section; the prose explains why each plan shape is the one we
want at 100 TB. This tool re-executes every documented query at the
correctness SF and splices the fresh AQE final plans back in, keeping the
prose — so the document stays regenerable each round instead of rotting.

Usage: python tools/make_plans.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLANS_MD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")

#: section name in PLANS.md -> registry query name (identity unless noted)
SECTIONS = [
    "wc_top_k",
    "rel_q1_pricing_summary",
    "rel_q3_shipping_priority",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "rel_asof_last_click",
    "rel_interval_join_bursts",
    "text_doc_profile",
    "pipeline_corpus_curation",
    "rel_sketch_suite",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark import get_session
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.plans.explain import formatted_plan
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries import QUERIES
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.queries.wordcount_q import flagship

    spark = get_session("make-plans")
    spark.sparkContext.setLogLevel("ERROR")

    def build(name):
        if name == "wc_top_k":
            # the original top-K-only shape (now the 'topk' branch of wc_suite)
            return flagship(spark, args.sf_dir)
        return QUERIES[name](spark, args.sf_dir)

    text = open(PLANS_MD).read()
    for name in SECTIONS:
        plan = formatted_plan(build(name), execute=True).rstrip()
        # Replace the ANCHORED plan fence (```text plan) after this
        # section's heading. The anchor exists so prose gaining an
        # ordinary fenced code block between heading and plan can never
        # make the splice overwrite the wrong block (ADVICE r4).
        pat = re.compile(
            rf"(^## {re.escape(name)}\n.*?\n```text plan\n).*?(\n```)", re.S | re.M
        )
        if not pat.search(text):
            raise SystemExit(
                f"anchored plan fence not found for section {name!r} — "
                "plan blocks must open with ```text plan"
            )
        text = pat.sub(lambda m: m.group(1) + plan + m.group(2), text, count=1)
        print("regenerated", name, flush=True)
    open(PLANS_MD, "w").write(text)
    print("wrote", PLANS_MD)


if __name__ == "__main__":
    main()
