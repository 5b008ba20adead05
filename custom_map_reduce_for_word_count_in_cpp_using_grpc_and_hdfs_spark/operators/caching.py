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

import weakref

from pyspark.sql import DataFrame


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
