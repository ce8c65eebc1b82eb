"""Fused Pallas probe kernel vs the XLA flags step (interpret mode on CPU).

The kernel (ops/probe_pallas.py) must reproduce the XLA fly probe's candidate
counts exactly and its flags at 128-position granularity: on TPU the engine
routes `_device_dense_phase1_flags` through it (engine/base.py), so any
numeric divergence would silently change phase-1 coverage.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvmatch_tpu.config import IndexConfig
from kvmatch_tpu.ops.probe_pallas import (FLAG, LANES, RT, TILE,
                                          probe_flags_tiles, views_for)
from kvmatch_tpu.parallel.query import (DenseSegments, _dense_probe,
                                        _dense_probe_norm,
                                        pack_segments_batch)
from kvmatch_tpu.plan import QuerySegment

pytestmark = pytest.mark.slow  # interpret-mode pallas is compile-heavy

INTERPRET = jax.default_backend() != "tpu"


def _mk_segments(data, offs, L, icfg, widths):
    seg_lists = []
    for o in offs:
        q = data[o:o + L]
        segs, pos = [], 0
        for w in widths:
            if (pos + 1) * icfg.unit + w > L:
                break
            mean = q[pos * icfg.unit: pos * icfg.unit + w].mean()
            segs.append(QuerySegment(order=pos + 1, w=w, mean_lo=mean,
                                     mean_hi=mean, count=1))
            pos += w // icfg.unit
        seg_lists.append(segs)
    return seg_lists


@pytest.mark.parametrize("norm", [False, True])
def test_probe_kernel_matches_xla_probe(norm):
    icfg = IndexConfig()
    rng = np.random.default_rng(0)
    L, Q = 512, 2
    NT = 2                       # two tiles
    blk = NT * TILE
    nv = views_for(L, icfg.unit)
    halo = (nv - 1) * TILE
    n = blk - 3000               # m inside the block; tail positions masked
    data = np.cumsum(rng.normal(0, 0.1, blk + halo + 400)).astype(np.float64)
    offs = rng.integers(0, n - L, Q)
    seg_lists = _mk_segments(data, offs, L, icfg, [100, 50, 25, 200, 25])
    segs = pack_segments_batch(seg_lists, tuple(icfg.scales))
    eps2 = jnp.asarray([1.0, 25.0], jnp.float32)
    if norm:
        cons = jnp.asarray(
            [[1.2, 5.0, data[o:o + L].mean(), data[o:o + L].std()]
             for o in offs], jnp.float32)
    else:
        cons = jnp.zeros((Q, 4), jnp.float32)

    # reference: the XLA probe's per-position bound over the same bucket rows
    from kvmatch_tpu.ops.sliding import build_buckets
    bk = build_buckets(jnp.asarray(data, jnp.float32), tuple(icfg.scales),
                       icfg.pos_of_d)
    bwin = jnp.stack([bk[w][: blk + halo] for w in icfg.scales])
    slack = np.float32(icfg.probe_guard)
    m = n - L + 1
    if norm:
        acc = jax.vmap(lambda sg, c: _dense_probe_norm(
            bwin, sg, icfg.unit, icfg.d, blk, slack,
            c[0], c[1], c[2], c[3], L))(segs, cons)
    else:
        acc = jax.vmap(lambda sg, c: _dense_probe(
            bwin, sg, icfg.unit, icfg.d, blk, slack, L))(
                segs, jnp.zeros((Q, 4)))
    pos = np.arange(blk)
    mask = (np.asarray(acc) <= np.asarray(eps2)[:, None]) & (pos[None, :] < m)
    ref_counts = mask.sum(axis=1)
    ref_flags = mask.reshape(Q, blk // FLAG, FLAG).any(axis=2)

    S = len(icfg.scales)
    WR = (NT + nv - 1) * RT
    bwin3 = bwin.reshape(S, WR, LANES)
    flags_t, counts = probe_flags_tiles(
        bwin3, segs.scale_idx, segs.order, segs.valid.astype(jnp.int32),
        segs.mean_lo, segs.mean_hi, segs.width, eps2[:, None], cons,
        jnp.asarray([[0, m]], jnp.int32),
        length=L, unit=icfg.unit, d=icfg.d, slack=float(icfg.probe_guard),
        norm=norm, interpret=INTERPRET)
    got_flags = np.asarray(flags_t).transpose(1, 0, 2).reshape(
        Q, NT * (TILE // FLAG)) > 0
    np.testing.assert_array_equal(np.asarray(counts), ref_counts)
    np.testing.assert_array_equal(got_flags, ref_flags)
    assert ref_counts.min() >= 1  # self-query offsets must be candidates
