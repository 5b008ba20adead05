"""Shared measured-crossover decision seam.

Three cost-aware defaults in this engine follow one pattern — measure a
cheap statistic, compare it to a crossover PINNED from an A/B run at
scale, log which side won and why, select the route:

- near-dup edge route (``queries/pipeline_q.choose_edge_method``):
  estimated shingle postings vs the 30M crossover where MinHash+LSH
  overtakes the exact shingle-index join (sf100 A/B: 0.33x).
- skewed-join strategy (``plans/skew.auto_skew_join``): the hottest
  key's ROW share vs the 0.5 crossover where salting beats leaving the
  hot key in one task (sf10 A/B: 3.4x win above, 2x loss below).
- streaming dedup state-store provider (``streaming/stateful``):
  expected distinct-key cardinality vs the on-heap blow-up point
  (sf100: 26.3 GB on-heap vs 449 MB RocksDB at 100M events).

Centralizing the compare-and-log step keeps every new cost-aware
default on one seam with one test pattern (VERDICT r9 item 7): the
callers stay responsible for MEASURING their statistic (each has a
different cheap path — metadata counts, sampled aggregates, caller
hints) and for acting on the label; this module owns the decision and
its audit trail.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

_LOG = logging.getLogger(__name__)


@dataclass(frozen=True)
class CostDecision:
    """The outcome of one measured-crossover decision, kept around so
    callers (and tests) can audit WHY a route was taken, not just which."""

    choice: str  #: label of the selected route
    stat: float  #: the measured statistic
    crossover: float  #: the pinned threshold it was compared against
    stat_name: str  #: human name of the statistic, for the log line

    @property
    def above(self) -> bool:
        return self.stat > self.crossover


def decide_crossover(
    stat: float,
    crossover: float,
    above_label: str,
    below_label: str,
    stat_name: str,
    logger: logging.Logger | None = None,
    detail: str = "",
) -> CostDecision:
    """Pick ``above_label`` iff ``stat > crossover`` (strict, matching
    both pre-existing callers), log the selection with the evidence, and
    return the full decision record.

    Pure and unit-testable at both ends of every caller's measured A/B —
    the convention set by ``_decide_edge_method`` / ``_decide_salting``,
    which now delegate here.
    """
    choice = above_label if stat > crossover else below_label
    d = CostDecision(choice=choice, stat=float(stat), crossover=float(crossover), stat_name=stat_name)
    (logger or _LOG).info(
        "cost crossover: %s = %.4g vs pinned %.4g -> %r%s",
        stat_name,
        d.stat,
        d.crossover,
        choice,
        f" ({detail})" if detail else "",
    )
    return d
