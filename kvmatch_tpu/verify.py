"""Phase-2 drivers: batched device distance evaluation + exact host confirmation.

Replaces the reference's per-offset early-abandon scans (QueryEngine.java:343-363,
NormQueryEngine.java:454-527, QueryEngineDtw.java:385-452) with:

  1. fixed-shape candidate batches on the TPU (padded to the configured batch size
     so jit re-traces only per query length),
  2. a one-sided guard band: every offset whose device f32 distance^2 is below
     eps^2 + guard is re-evaluated exactly in float64 on the host.  Device work
     prunes ~all losers at HBM bandwidth; the handful of near-threshold survivors
     get exact confirmation, so the final answer set equals the float64 oracle's.

The batching also replaces MAX_SCAN_DATA_LENGTH chunked reads
(NormQueryEngine.java:60,454-479): the series is device-resident, so "scans" are
gathers, and batch size is a tiling knob rather than an IO knob.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np


def pad_batches(offsets: np.ndarray, batch: int) -> np.ndarray:
    """Pad to a multiple of ``batch`` (repeating the first offset, masked later)."""
    pad = (-offsets.size) % batch
    if pad:
        offsets = np.concatenate([offsets, np.full(pad, offsets[0], offsets.dtype)])
    return offsets


def device_distances(offsets: np.ndarray, batch: int,
                     kernel: Callable[[np.ndarray], np.ndarray]) -> np.ndarray:
    """Run ``kernel`` (a jit'd (B,)->... distance function) over fixed-size batches."""
    m = offsets.size
    padded = pad_batches(offsets.astype(np.int32), batch)
    outs = []
    for s in range(0, padded.size, batch):
        outs.append(np.asarray(kernel(padded[s:s + batch])))
    return np.concatenate(outs)[:m] if outs else np.empty(0, np.float32)


def guard_threshold(eps2: float, length: int, guard: float) -> float:
    """Absolute guard-band width above eps^2 for f32 device distances."""
    return guard * (eps2 + 1.0) + 1e-4 * length
