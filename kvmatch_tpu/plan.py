"""Phase 0 — query segmentation by dynamic programming.

Host-side re-implementation of determineQueryPlan (QueryEngine.java:424-501,
QueryEngineDtw.java:515-644, NormQueryEngine.java:593-670): split the query's
m = L/unit unit windows into at most 30 variable-width segments drawn from the
enabled scale set, minimizing the average log-selectivity estimated from the index
meta tables.  The DP is O(m * 30 * |scales|) on arrays of size m <= L/25 — far too
small to benefit from the device, so it stays in NumPy (SURVEY.md section 7 'DP
segmentation under jit').

Cost evaluation is delegated to a callable so each engine variant can plug in its
own probe-range arithmetic (plain ED range, DTW envelope range, alpha/beta
normalized bounds).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from .config import IndexConfig, QueryConfig


@dataclasses.dataclass
class QuerySegment:
    """One probe segment (common/QuerySegment.java:23-76, RangeQuerySegment.java:23-87).

    ``order`` is the 1-based unit-window position of the segment's left edge;
    ``mean_lo == mean_hi`` for the ED engines, and they carry the averaged Lemire
    envelope bounds for the DTW engines.
    """
    order: int
    w: int
    mean_lo: float
    mean_hi: float
    count: int  # selectivity estimate (#index intervals in probe range)


def unit_sums(query: np.ndarray, unit: int) -> np.ndarray:
    """Sum of each disjoint unit window of the query (QueryEngine.java:427-436)."""
    m = query.size // unit
    return query[: m * unit].reshape(m, unit).sum(axis=1, dtype=np.float64)


def envelope(query: np.ndarray, radius: int) -> Tuple[np.ndarray, np.ndarray]:
    """Edge-clamped Lemire envelope of the query (QueryEngineDtw.java:518-560).

    Returns (L, U) with L[i] = min(query[i-r : i+r+1]), clamped at the ends.
    """
    if radius <= 0:
        return query.astype(np.float64), query.astype(np.float64)
    pad = np.concatenate([np.repeat(query[0], radius), query,
                          np.repeat(query[-1], radius)]).astype(np.float64)
    win = np.lib.stride_tricks.sliding_window_view(pad, 2 * radius + 1)
    return win.min(axis=1), win.max(axis=1)


# cost_fn(l, r, sum_lo, sum_hi) -> (log_cost, interval_count); l..r inclusive unit
# windows, sum_lo/sum_hi the segment's mean bounds already divided by width.
CostFn = Callable[[int, int, float, float], Tuple[float, int]]


def determine_query_plan(
    length: int,
    sums_lo: np.ndarray,
    sums_hi: np.ndarray,
    cost_fn: CostFn,
    icfg: IndexConfig,
    qcfg: QueryConfig,
) -> List[QuerySegment]:
    """DP segmentation; ``sums_lo``/``sums_hi`` are per-unit-window sums of the lower
    and upper mean tracks (equal for ED).  Mirrors QueryEngine.java:438-500."""
    unit = icfg.unit
    m = sums_lo.size
    max_j = min(m, qcfg.max_segments)
    enabled_k = [k for k in range(1, len(icfg.wu_list) + 1)
                 if icfg.wu_enabled[k - 1] and icfg.wu_list[k - 1] == unit * k]

    pre_lo = np.concatenate(([0.0], np.cumsum(sums_lo)))
    pre_hi = np.concatenate(([0.0], np.cumsum(sums_hi)))

    INF = float("inf")
    dp = np.full((m + 1, max_j + 1), INF)
    pre = np.full((m + 1, max_j + 1), -1, np.int64)
    dp[0, 0] = 0.0
    cost_cache: dict = {}

    def seg_cost(l: int, r: int) -> Tuple[float, int]:
        key = (l, r)
        if key not in cost_cache:
            w = unit * (r - l + 1)
            mean_lo = (pre_lo[r + 1] - pre_lo[l]) / w
            mean_hi = (pre_hi[r + 1] - pre_hi[l]) / w
            cost_cache[key] = cost_fn(l, r, mean_lo, mean_hi)
        return cost_cache[key]

    for i in range(1, m + 1):
        for j in range(1, min(i, max_j) + 1):
            best, best_k = INF, -1
            for k in enabled_k:
                if i - k < 0 or dp[i - k, j - 1] == INF:
                    continue
                c, _ = seg_cost(i - k, i - 1)
                tmp = ((j - 1) * dp[i - k, j - 1] + c) / j
                if tmp < best:
                    best, best_k = tmp, k
            dp[i, j] = best
            pre[i, j] = best_k

    # Minimum segment count: (floor(log2 L) - 1) // 2  (QueryEngine.java:480).
    j_lo = max(1, (int(math.floor(math.log2(length))) - 1) // 2)
    best, p = INF, -1
    for j in range(j_lo, max_j + 1):
        if dp[m, j] <= best:
            best, p = dp[m, j], j
    if p < 0:  # fall back to any feasible plan
        for j in range(1, max_j + 1):
            if dp[m, j] < INF:
                best, p = dp[m, j], j
                break
    segments: List[QuerySegment] = []
    index, j = m, p
    while index > 0 and j > 0 and pre[index, j] > 0:
        k = int(pre[index, j])
        l, r = index - k, index - 1
        w = unit * k
        mean_lo = (pre_lo[r + 1] - pre_lo[l]) / w
        mean_hi = (pre_hi[r + 1] - pre_hi[l]) / w
        _, cnt = seg_cost(l, r)
        segments.append(QuerySegment(order=l + 1, w=w, mean_lo=mean_lo,
                                     mean_hi=mean_hi, count=cnt))
        index -= k
        j -= 1
    segments.reverse()

    if qcfg.enable_query_reordering:
        segments.sort(key=lambda s: s.count)  # most selective first
    return segments
