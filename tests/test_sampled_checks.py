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


def test_make_planted_cosine_slice_properties():
    """The planted-dup cosine slice (SCALE.md lesson 29): one plant per
    10 slice vectors, copies get ids above the corpus range, planted
    cosines land in [0.97, 0.996] (comfortably above the 0.9 threshold,
    below exact-duplicate 1.0), and the file is written once (cached)."""
    import numpy as np

    import tools.sf10_sampled_checks as T

    # the tool caches under <repo>/.scratch/cosine_sampled; the finally
    # below removes the smoke-SF artifact so reruns regenerate it
    path, n_planted = T.make_planted_cosine_slice(SF_SMOKE, 3)
    try:
        import duckdb

        con = duckdb.connect()
        n_slice = con.execute(
            f"SELECT count(*) FROM '{SF_SMOKE}/embeddings.parquet' WHERE vec_id % 3 = 0"
        ).fetchone()[0]
        max_id = con.execute(
            f"SELECT max(vec_id) FROM '{SF_SMOKE}/embeddings.parquet'"
        ).fetchone()[0]
        rows = con.execute(f"SELECT vec_id, embedding FROM '{path}'").fetchall()
        assert len(rows) == n_slice + n_planted
        assert n_planted == (n_slice + 9) // 10
        vecs = {r[0]: np.asarray(r[1], dtype=np.float64) for r in rows}
        plants = [i for i in vecs if i > max_id]
        assert len(plants) == n_planted
        for pid in plants:
            orig = vecs[pid - max_id - 1]
            cos = float(
                orig @ vecs[pid] / (np.linalg.norm(orig) * np.linalg.norm(vecs[pid]))
            )
            assert 0.965 <= cos <= 0.9965, (pid, cos)
        # cached: second call returns the same file unmodified
        mtime = os.path.getmtime(path)
        path2, n2 = T.make_planted_cosine_slice(SF_SMOKE, 3)
        assert (path2, n2) == (path, n_planted)
        assert os.path.getmtime(path) == mtime
    finally:
        os.remove(path)
