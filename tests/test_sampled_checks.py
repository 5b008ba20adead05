"""Regression coverage for tools/sf10_sampled_checks.py — the sampled-slice
oracle harness that gives the sf10 decade its correctness signal (SCALE.md
lesson 28). The tool itself runs out-of-band at sf10; these tests pin its
two load-bearing properties at smoke SF so a refactor can't silently break
the next scale run:

1. `make_sampled_dir` produces a parquet dir where ONLY `documents` is
   sliced (deterministically, by id) and every other table still resolves
   to the full-scale data through the registry loader and the DuckDB view
   harness alike.
2. A registry query + its unchanged oracle stay hash-exact when both run
   against the sampled dir — the core claim that "shrink the data, never
   the plan" preserves comparability.
"""

from __future__ import annotations

import os
import shutil

import pytest

from .conftest import SF_SMOKE
from .oracle_harness import run_parity

K = 3


@pytest.fixture(scope="module")
def sampled_dir():
    from tools.sf10_sampled_checks import make_sampled_dir

    # copy the smoke dir so the tool's outputs never land in the
    # read-only driver fixtures
    work = os.path.join(os.path.dirname(__file__), "..", ".scratch", "sampled_smoke")
    work = os.path.abspath(work)
    if os.path.exists(work):
        shutil.rmtree(work)
    os.makedirs(work)
    for f in os.listdir(SF_SMOKE):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(SF_SMOKE, f), os.path.join(work, f))
    yield make_sampled_dir(work, K)
    shutil.rmtree(work)


def test_documents_sliced_other_tables_full(spark, sampled_dir):
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.sources import load_table

    full_docs = load_table(spark, SF_SMOKE, "documents")
    docs = load_table(spark, sampled_dir, "documents")
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    assert ids, "sample must be non-empty"
    assert all(i % K == 0 for i in ids)
    assert docs.count() == full_docs.where(f"doc_id % {K} = 0").count()
    # every other table resolves to the FULL data (symlinked, not sliced)
    for t in ("lineitem", "embeddings", "events"):
        assert load_table(spark, sampled_dir, t).count() == load_table(spark, SF_SMOKE, t).count()


def test_registry_query_and_oracle_agree_on_sampled_dir(spark, sampled_dir):
    """The exact property the sf10 record relies on: the UNCHANGED
    registry query and oracle, pointed at the sampled dir, still compare
    hash-exact (documents-derived, so the slice actually matters)."""
    run_parity(spark, sampled_dir, "dedup_exact_suite")


def test_sampled_dir_is_idempotent(sampled_dir):
    from tools.sf10_sampled_checks import make_sampled_dir

    again = make_sampled_dir(os.path.dirname(sampled_dir.rstrip("/")), K)
    assert again == sampled_dir
