"""Dense, fully-jitted query step — single-chip and mesh-sharded (SPMD).

The host engines (engine/*.py) use ragged interval lists, which are fast but not
jittable.  This module is the TPU-pure alternative: phase 1 is evaluated *densely*
against the per-scale bucket arrays (the raw index) as fused elementwise ops, and
phase 2 verifies a bounded top-K candidate set in the same jit program:

  for each probe segment s:                    (lax.fori_loop, static max count)
      eps_acc[q] += w_s * dist(mean_s, bucket cell at q + (order_s-1)*unit)^2
  mask = eps_acc <= eps^2                      (no-false-dismissal lower bound)
  candidates = first K positions of mask       (jnp.nonzero, static K)
  d2 = batched ED on gathered windows          (phase 2)

Under ``jax.shard_map`` the series and bucket stack are sharded by offset range
with a right-halo ppermute (ICI), segment parameters are replicated, and each
shard emits its own top-K — the cross-shard "candidate all-gather" of SURVEY.md
section 2.6.  Deviations from the host engines, both sound: the probe range uses
the full epsilon budget for every segment (no sequential budget shrinking), and
candidate sets are truncated at K per shard (the returned count flags overflow).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import IndexConfig
from .mesh import AXIS

MAX_SEGMENTS = 30
# Fill value for positions past the end of a scale's bucket array: maps to an
# astronomically distant mean cell, so the probe assigns an epsilon far above any
# budget — out-of-range windows prune themselves.
BIG_BUCKET = np.int32(2 ** 30)


def pack_bucket_stack(buckets, scales, n: int, extra: int) -> np.ndarray:
    """Stack per-scale bucket arrays into (n_scales, n + extra) with BIG_BUCKET
    fill; ``extra`` must cover the largest segment shift (the query length)."""
    out = np.full((len(scales), n + extra), BIG_BUCKET, np.int32)
    for i, w in enumerate(scales):
        b = np.asarray(buckets[w], np.int32)
        out[i, : b.size] = b
    return out


class DenseSegments(NamedTuple):
    """Replicated segment parameters, padded to MAX_SEGMENTS."""
    scale_idx: jnp.ndarray  # i32[S] index into the scale list
    order: jnp.ndarray      # i32[S] 1-based unit offset
    mean_lo: jnp.ndarray    # f32[S]
    mean_hi: jnp.ndarray    # f32[S]
    width: jnp.ndarray      # f32[S] window width w
    valid: jnp.ndarray      # bool[S]


def pack_segments(segments, scales: Tuple[int, ...]) -> DenseSegments:
    S = MAX_SEGMENTS
    scale_pos = {w: i for i, w in enumerate(scales)}
    k = len(segments)
    return DenseSegments(
        scale_idx=jnp.asarray(np.array([scale_pos[s.w] for s in segments] + [0] * (S - k), np.int32)),
        order=jnp.asarray(np.array([s.order for s in segments] + [1] * (S - k), np.int32)),
        mean_lo=jnp.asarray(np.array([s.mean_lo for s in segments] + [0.0] * (S - k), np.float32)),
        mean_hi=jnp.asarray(np.array([s.mean_hi for s in segments] + [0.0] * (S - k), np.float32)),
        width=jnp.asarray(np.array([float(s.w) for s in segments] + [1.0] * (S - k), np.float32)),
        valid=jnp.asarray(np.array([True] * k + [False] * (S - k))),
    )


def _dense_probe(bstack: jnp.ndarray, segs: DenseSegments, unit: int,
                 d: float, out_len: int, slack: float) -> jnp.ndarray:
    """Accumulated epsilon lower bound per local candidate position.

    Bucket ids advance by one per d-wide grid cell (utils/rounding.bucket_id), so
    the cell covered by bucket b is [b*d, b*d + d], widened by the probe slack."""

    def body(s, acc):
        brow = bstack[segs.scale_idx[s]]
        shift = (segs.order[s] - 1) * unit
        b = jax.lax.dynamic_slice(brow, (shift,), (out_len,)).astype(jnp.float32)
        key_lo = b * np.float32(d) - slack
        key_hi = key_lo + np.float32(d) + 2 * slack
        delta = jnp.maximum(jnp.maximum(key_lo - segs.mean_hi[s],
                                        segs.mean_lo[s] - key_hi), 0.0)
        eps = segs.width[s] * delta * delta
        return acc + jnp.where(segs.valid[s], eps, 0.0)

    # Derive the accumulator from the (possibly shard-varying) bucket stack so
    # the fori_loop carry has consistent manual-axis types under shard_map.
    acc0 = jnp.zeros(out_len, jnp.float32) + 0.0 * bstack[0, :out_len].astype(jnp.float32)
    return jax.lax.fori_loop(0, MAX_SEGMENTS, body, acc0)


def make_dense_query_step(icfg: IndexConfig, length: int, top_k: int = 2048,
                          scales: Tuple[int, ...] | None = None):
    """Single-device jittable query step.

    Args to the returned fn: (data f32[n], bstack i32[n_scales, n], query f32[L],
    segs DenseSegments, eps2 f32[]) -> (count i32, offsets i32[K], d2 f32[K]).
    """
    scales = scales or tuple(icfg.scales)
    unit = icfg.unit
    slack = np.float32(icfg.probe_guard)

    def step(data, bstack, query, segs: DenseSegments, eps2):
        n = data.shape[0]
        m = n - length + 1
        eps_acc = _dense_probe(bstack, segs, unit, icfg.d, n, slack)
        pos = jnp.arange(n, dtype=jnp.int32)
        mask = (eps_acc <= eps2) & (pos < m)
        count = jnp.sum(mask.astype(jnp.int32))
        (idx,) = jnp.nonzero(mask, size=top_k, fill_value=n - length)
        x = data[idx[:, None] + jnp.arange(length, dtype=jnp.int32)[None, :]]
        diff = x - query[None, :]
        d2 = jnp.sum(diff * diff, axis=1)
        live = jnp.arange(top_k) < count
        d2 = jnp.where(live, d2, jnp.inf)
        return count, idx, d2

    return jax.jit(step)


def pack_segments_batch(segment_lists, scales: Tuple[int, ...]) -> DenseSegments:
    """Stack per-query DenseSegments into leading-Q arrays for the batched step."""
    packed = [pack_segments(s, scales) for s in segment_lists]
    return DenseSegments(*[jnp.stack([getattr(p, f) for p in packed])
                           for f in DenseSegments._fields])


def make_dense_query_step_batched(icfg: IndexConfig, length: int,
                                  top_k: int = 1024,
                                  scales: Tuple[int, ...] | None = None):
    """Single-device, MULTI-QUERY jittable step: phase 1 for a whole query batch
    as one fused program (vmap of the dense probe over the query dimension).

    Args: (data f32[n], bstack i32[S, n+pad], queries f32[Q, L],
    segs DenseSegments with leading Q dims, eps2 f32[Q])
    -> (counts i32[Q], offsets i32[Q, K], d2 f32[Q, K]).
    """
    scales = scales or tuple(icfg.scales)
    unit = icfg.unit
    slack = np.float32(icfg.probe_guard)

    def step(data, bstack, queries, segs: DenseSegments, eps2):
        n = data.shape[0]
        m = n - length + 1
        eps_acc = jax.vmap(
            lambda sg: _dense_probe(bstack, sg, unit, icfg.d, n, slack))(segs)
        pos = jnp.arange(n, dtype=jnp.int32)
        mask = (eps_acc <= eps2[:, None]) & (pos[None, :] < m)
        counts = jnp.sum(mask.astype(jnp.int32), axis=1)
        # top_k over masked scores gives each query's K candidate positions
        # (jnp.nonzero is not vmappable; top-k by smallest accumulated bound is).
        scores = jnp.where(mask, -eps_acc, -jnp.inf)
        _, idx = jax.lax.top_k(scores, top_k)
        idx = jnp.minimum(idx.astype(jnp.int32), m - 1)

        def one(q_row, idx_row):
            x = jax.vmap(lambda o: jax.lax.dynamic_slice(data, (o,), (length,)))(idx_row)
            diff = x - q_row[None, :]
            return jnp.sum(diff * diff, axis=1)

        d2 = jax.vmap(one)(queries, idx)
        live = jnp.arange(top_k)[None, :] < jnp.minimum(counts, top_k)[:, None]
        d2 = jnp.where(live, d2, jnp.inf)
        return counts, idx, d2

    return jax.jit(step)


def make_sharded_query_step_batched(mesh: Mesh, icfg: IndexConfig, length: int,
                                    top_k: int = 256,
                                    scales: Tuple[int, ...] | None = None):
    """Mesh-sharded multi-query step: offset-range sharding x query batching.

    Each shard evaluates the dense probe for EVERY query over its own positions
    (vmap over the query dim), verifies its local top-K per query, and emits
    per-shard results; concatenating across shards is the candidate all-gather.
    """
    scales = scales or tuple(icfg.scales)
    unit = icfg.unit
    halo = length
    slack = np.float32(icfg.probe_guard)
    n_sh = mesh.devices.size

    def per_shard(data, bstack, queries, segs: DenseSegments, eps2, n_total):
        per = data.shape[0]
        shard_id = jax.lax.axis_index(AXIS)
        src_dst = [(i, (i - 1) % n_sh) for i in range(n_sh)]
        data_h = jnp.concatenate([data, jax.lax.ppermute(data[:halo], AXIS, src_dst)])
        b_h = jnp.concatenate(
            [bstack, jax.lax.ppermute(bstack[:, :halo], AXIS, src_dst)], axis=1)
        eps_acc = jax.vmap(
            lambda sg: _dense_probe(b_h, sg, unit, icfg.d, per, slack))(segs)
        gpos = shard_id * per + jnp.arange(per, dtype=jnp.int32)
        mask = (eps_acc <= eps2[:, None]) & (gpos[None, :] < n_total - length + 1)
        counts = jnp.sum(mask.astype(jnp.int32), axis=1)
        scores = jnp.where(mask, -eps_acc, -jnp.inf)
        _, idx = jax.lax.top_k(scores, top_k)
        idx = idx.astype(jnp.int32)

        def one(q_row, idx_row):
            x = jax.vmap(lambda o: jax.lax.dynamic_slice(data_h, (o,), (length,)))(idx_row)
            diff = x - q_row[None, :]
            return jnp.sum(diff * diff, axis=1)

        d2 = jax.vmap(one)(queries, idx)
        live = jnp.arange(top_k)[None, :] < jnp.minimum(counts, top_k)[:, None]
        d2 = jnp.where(live, d2, jnp.inf)
        totals = jax.lax.psum(counts, AXIS)
        return totals, (shard_id * per + idx)[None], d2[None]

    fn = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(AXIS), P(None, AXIS), P(), P(), P(), P()),
        out_specs=(P(), P(AXIS), P(AXIS)))
    return jax.jit(fn)


def make_sharded_query_step(mesh: Mesh, icfg: IndexConfig, length: int,
                            top_k: int = 1024,
                            scales: Tuple[int, ...] | None = None):
    """Mesh-sharded jittable query step (SPMD over offset ranges).

    data/bstack are sharded along the offset axis; query/segments/eps are
    replicated.  Each shard probes its own positions, pulls a ``length``-point
    right halo over ICI for window gathers, and emits its local top-K candidates;
    outputs are sharded so the concatenation is the candidate all-gather.
    """
    scales = scales or tuple(icfg.scales)
    unit = icfg.unit
    halo = length  # covers both the window gather (L) and segment shifts (< L)
    slack = np.float32(icfg.probe_guard)
    n_sh = mesh.devices.size

    def per_shard(data, bstack, query, segs: DenseSegments, eps2, n_total):
        per = data.shape[0]
        shard_id = jax.lax.axis_index(AXIS)
        src_dst = [(i, (i - 1) % n_sh) for i in range(n_sh)]
        data_h = jnp.concatenate([data, jax.lax.ppermute(data[:halo], AXIS, src_dst)])
        b_h = jnp.concatenate(
            [bstack, jax.lax.ppermute(bstack[:, :halo], AXIS, src_dst)], axis=1)
        eps_acc = _dense_probe(b_h, segs, unit, icfg.d, per, slack)
        gpos = shard_id * per + jnp.arange(per, dtype=jnp.int32)
        mask = (eps_acc <= eps2) & (gpos < n_total - length + 1)
        count = jnp.sum(mask.astype(jnp.int32))
        (idx,) = jnp.nonzero(mask, size=top_k, fill_value=0)
        x = data_h[idx[:, None] + jnp.arange(length, dtype=jnp.int32)[None, :]]
        diff = x - query[None, :]
        d2 = jnp.sum(diff * diff, axis=1)
        live = jnp.arange(top_k) < count
        d2 = jnp.where(live, d2, jnp.inf)
        total = jax.lax.psum(count, AXIS)
        return total, (shard_id * per + idx)[None, :], d2[None, :]

    fn = jax.shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(AXIS), P(None, AXIS), P(), P(), P(), P()),
        out_specs=(P(), P(AXIS), P(AXIS)))
    return jax.jit(fn)
