"""Cache-lifetime discipline for operators that persist intermediates.

Several dedup operators persist an intermediate (shingle index, MinHash
signatures, SimHash fingerprints) that the returned plan references many
times. The persist is load-bearing — without it Catalyst's
CollapseProject inlines the producing expression into every reference —
but a bare ``persist()`` leaks: the cache entry outlives the query and
slowly squeezes executor memory in a long-lived session embedding the
operators.

Contract implemented here: **cached intermediates live exactly as long
as the returned DataFrame object**. ``tie_cache_lifetime`` attaches a
``weakref.finalize`` to the result; when the caller drops the result
(after its action has run), every tied frame is unpersisted. Finalizers
chain — a tied frame that was itself returned by ``tie_cache_lifetime``
stays alive (the closure holds it) until the outer result dies, then its
own finalizer fires — so composed operators release in dependency order.
"""

from __future__ import annotations

import logging
import weakref

from pyspark.sql import DataFrame

logger = logging.getLogger(__name__)

#: Default bound on how many cached bytes one scanned byte can become
#: through the explode/aggregate chains these operators cache. This is
#: an EMPIRICAL ceiling, not a proof: measured instances are the sf0.1
#: shingle index ≈ 8× its 0.6 MB parquet source and the sf10 index ≈
#: 17× (tiny vocabulary compresses the cache poorly); 32× covers both
#: with ~2× headroom. A shape that expands harder — hashed=False string
#: shingles over highly-compressed parquet is the plausible case —
#: should pass its own ``expansion_bound`` at the call site rather than
#: trust this default; the lazy-path log line below is the audit trail
#: for diagnosing a mis-broadcast that slipped past the bound.
_EXPANSION_BOUND = 32


def _broadcast_risk(df: DataFrame, expansion_bound: int = _EXPANSION_BOUND) -> bool:
    """Could ``df``'s true materialized size exceed the broadcast
    threshold even though Catalyst's estimate says otherwise?

    ``False`` only when the source scan's file bytes (accurately known,
    unlike the post-``Generate`` estimate) say the cached relation stays
    broadcast-safe at ``expansion_bound``× growth — then a mis-estimated
    broadcast is still a CORRECT broadcast and the eager count buys
    nothing. The guarantee is only as strong as the bound: it holds for
    every cached-bytes-per-source-byte ratio the engine has measured,
    not for arbitrary shapes. Unknown sizes (remote schemes, non-file
    sources) report ``True``: at production scale, materialize and
    measure."""
    from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.plans.parallelism import _as_bytes, scan_file_sizes

    try:
        threshold = _as_bytes(df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    except Exception:
        return True
    if threshold <= 0:  # auto-broadcast disabled: nothing to mis-plan
        return False
    sizes = scan_file_sizes(df)
    if sizes is None:
        return True
    return sum(sizes) * expansion_bound >= threshold


def eager_stats(df: DataFrame, expansion_bound: int = _EXPANSION_BOUND) -> DataFrame:
    """Persist ``df`` and materialize it NOW, so joins planned afterwards
    see the cache's MEASURED size instead of Catalyst's estimate.

    The materializing ``count()`` is an extra job (~1.5 s fixed cost at
    small SF, measured round 5), so it runs only when it can change a
    decision: when the source scan is big enough — or unsizeable — that
    the true cached size could cross the broadcast threshold at
    ``expansion_bound``× growth (:func:`_broadcast_risk`; pass a
    shape-specific bound when the default's measured ceiling doesn't
    cover the caller's expansion). Small sources keep the lazy persist
    and their (correct) broadcast plans; the sf0.1 driver bench takes
    the lazy path, the sf10 OOM repro takes the eager one. Lazy-path
    decisions are logged (source bytes, bound, threshold) so a future
    mis-broadcast is diagnosable from the log rather than from a driver
    OOM autopsy.

    Why this exists (sf10 smoke, round 5): explode-derived relations are
    systematically under-estimated — ``Generate`` propagates its child's
    ``sizeInBytes`` without multiplying by fan-out, and the narrow
    (id, hash) projection then SHRINKS the number — so a ~1 GB shingle
    inverted index carried a 17 MB estimate at sf10 and the static
    planner picked it as a BroadcastHashJoin BUILD side: the broadcast
    build OOM'd the driver. No statistics conf fixes this (the error is
    structural, not a compression ratio), but a materialized
    InMemoryRelation reports measured bytes: small frames still
    broadcast (sf0.1 keeps its fast plans), corpus-scale ones fall back
    to shuffle joins — the plan decision tracks the data, not the
    estimate. The extra count() action is absorbed by the persist the
    operator needed anyway.

    At 100 TB the same discipline holds for free: candidate-generation
    inputs live as written stores (signature/shingle indexes in parquet)
    whose file sizes the planner reads directly.
    """
    df = df.persist()
    if _broadcast_risk(df, expansion_bound):
        df.count()
    else:
        from custom_map_reduce_for_word_count_in_cpp_using_grpc_and_hdfs_spark.plans.parallelism import scan_file_sizes

        sizes = scan_file_sizes(df)
        logger.info(
            "eager_stats: lazy persist (source %s bytes x bound %s under the "
            "broadcast threshold) — if this relation later mis-broadcasts, "
            "raise expansion_bound at this call site",
            sum(sizes) if sizes else "?",
            expansion_bound,
        )
    return df


def tie_cache_lifetime(result: DataFrame, *frames: DataFrame) -> DataFrame:
    """Unpersist every frame in ``frames`` when ``result`` is garbage
    collected. Frames are also kept alive (strongly referenced by the
    finalizer closure) until then, so chained finalizers fire in
    dependency order. Returns ``result`` for fluent use."""

    def _release(frames=frames):
        for f in frames:
            try:
                f.unpersist(blocking=False)
            except Exception:
                # session already stopped / JVM gone — nothing to release
                pass

    weakref.finalize(result, _release)
    return result


def materialize(df: DataFrame) -> DataFrame:
    """Truncate lineage for an iterative operator's per-round frame:
    reliable ``checkpoint()`` when the session has a checkpoint directory
    configured, executor-local ``localCheckpoint()`` otherwise.

    The distinction is fault-tolerance posture, not semantics (both
    materialize and cut lineage). ``localCheckpoint`` stores blocks in
    executor memory/disk — if an executor dies mid-iteration the blocks
    are gone AND the lineage needed to recompute them was discarded, so
    the whole job fails; acceptable in a single-JVM local session, not in
    a 1000-executor job whose label-propagation loop runs for minutes.
    Setting ``spark.sparkContext.setCheckpointDir(<reliable store>)``
    (HDFS/S3 on a real cluster) flips every iterative operator to
    reliable checkpoints with no call-site changes: blocks land in the
    shared store and survive any executor. The extra I/O is one write +
    one read of a frame that is already being materialized for the
    convergence count, once per round."""
    sc = df.sparkSession.sparkContext
    try:
        has_dir = sc._jsc.sc().getCheckpointDir().isDefined()  # noqa: SLF001
    except Exception:
        # connect-mode session: no JVM handle; local semantics apply
        has_dir = False
    return df.checkpoint() if has_dir else df.localCheckpoint()
