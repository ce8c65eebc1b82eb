"""Pallas banded-DTW: the DP carry lives in VMEM for the whole row loop.

The XLA lax.scan formulation (ops/dtw.dtw_banded_batch*) round-trips its
(B, W) carry plus every cumsum/cummin intermediate through HBM on each of the
L rows — tens of GB of traffic for a batch that only *needs* to read the
(B, L) windows once.  On the bandwidth-constrained dev TPU that measured
~12k candidates/s at 0.4% of the chip's FLOPs (VERDICT r2 item 5).  Here one
grid cell processes a (BT, L) tile of candidates entirely on-chip:

    HBM traffic = read a-tile + read padded-query tile + write (BT,) out,

i.e. ~2*B*L*4 bytes total, with the carry, the per-row band cumsum and the
prefix-min all computed in VMEM via log-shift (pltpu.roll) passes.

The recurrence is the same prefix-scan form as the XLA kernel
(DtwUtils.java:269-337 redesigned):  D[k] = C[k] + min_{j<=k}(M[j] - C[j-1]),
M = min(P[k], P[k+1]), C = cumsum(d).  Only static BlockSpec pipelining is
used — no dynamic-offset HBM DMA (the axon tunnel rejects those; ROADMAP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BIG = np.float32(1e30)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _tile_rows_for(L_pad: int, q_pad: int, W_pad: int) -> int:
    """Candidate rows per grid cell: fit double-buffered input blocks plus the
    carry and scan temporaries in ~12 MB of VMEM."""
    budget = 12 * 1024 * 1024
    per_row = 4 * (2 * (L_pad + q_pad) + 6 * W_pad)
    bt = budget // max(per_row, 1)
    bt = max(8, min(512, (bt // 8) * 8))
    return bt


#: Rows per aligned block: Mosaic only allows lane-dimension dynamic slices
#: at 128-aligned starts, so the kernel loads q/a segments once per aligned
#: 128-row block and unrolls the 128 row updates with STATIC in-block slices.
_ROW_BLK = 128


def _dtw_kernel(L: int, r: int, W_pad: int):
    """Kernel body builder; closes over static shapes only."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = 2 * r + 1

    def kernel(a_ref, q_ref, out_ref, p_ref):
        BT = a_ref.shape[0]
        kvec = jax.lax.broadcasted_iota(jnp.int32, (BT, W_pad), 1)
        in_band = kvec < W
        p_ref[:] = jnp.full((BT, W_pad), BIG, jnp.float32)
        nblk = -(-L // _ROW_BLK)

        def blk_body(blk, _):
            i0 = pl.multiple_of(blk * _ROW_BLK, _ROW_BLK)
            # q_ref columns [i, i+W) hold q[i - r + k] (r leading zeros)
            qseg = q_ref[:, pl.ds(i0, W_pad + _ROW_BLK)]
            aseg = a_ref[:, pl.ds(i0, _ROW_BLK)]

            for t in range(_ROW_BLK):
                i = blk * _ROW_BLK + t

                @pl.when(i < L)
                def _():
                    qv = jax.lax.slice_in_dim(qseg, t, t + W_pad, axis=1)
                    acol = jax.lax.slice_in_dim(aseg, t, t + 1, axis=1)
                    j = i - r + kvec
                    valid = in_band & (j >= 0) & (j < L)
                    d = (acol - qv) ** 2
                    d = jnp.where(valid, d, 0.0)

                    P = p_ref[:]
                    # circular left-shift by 1 == roll by W_pad - 1
                    sh = pltpu.roll(P, W_pad - 1, 1)
                    sh = jnp.where(kvec >= W - 1, BIG, sh)
                    M = jnp.minimum(P, sh)
                    M = jnp.where(i == 0,
                                  jnp.where(kvec == r, 0.0, BIG), M)

                    # inclusive prefix sum of d along the band (log-shift)
                    C = d
                    s = 1
                    while s < W_pad:
                        C = C + jnp.where(kvec >= s, pltpu.roll(C, s, 1), 0.0)
                        s *= 2
                    Cprev = jnp.where(kvec >= 1, pltpu.roll(C, 1, 1), 0.0)
                    G = M - Cprev
                    s = 1
                    while s < W_pad:
                        G = jnp.minimum(
                            G, jnp.where(kvec >= s, pltpu.roll(G, s, 1), BIG))
                        s *= 2
                    D = C + G
                    D = jnp.where(valid, jnp.minimum(D, BIG), BIG)
                    p_ref[:] = D
            return 0

        jax.lax.fori_loop(0, nblk, blk_body, 0)
        out_ref[:] = jnp.broadcast_to(p_ref[:, r][:, None], out_ref.shape)

    return kernel


@functools.partial(jax.jit, static_argnames=("r", "interpret"))
def dtw_banded_pallas_multi(a_batch: jnp.ndarray, q_batch: jnp.ndarray,
                            r: int, interpret: bool = False) -> jnp.ndarray:
    """Banded DTW distances, per-row query: a_batch (B, L) vs q_batch (B, L).

    Bit-compatible in structure with ops/dtw.dtw_banded_batch_multi (same
    prefix-scan recurrence; f32 rounding differs only by summation order,
    which the engines' guard bands already absorb)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L = a_batch.shape
    W = 2 * r + 1
    W_pad = _round_up(W, 128)
    L_pad = _round_up(L, 128)
    # query padded with r zeros in front so q_pad[:, i + k] = q[i - r + k],
    # and enough tail zeros for the per-block aligned slice to stay in bounds
    Q_pad = L_pad + W_pad + _ROW_BLK
    q_pad = jnp.pad(q_batch, ((0, 0), (r, Q_pad - r - L)))
    a_pad = jnp.pad(a_batch, ((0, 0), (0, L_pad - L)))

    BT = _tile_rows_for(L_pad, Q_pad, W_pad)
    B_pad = _round_up(B, BT)
    if B_pad != B:
        a_pad = jnp.pad(a_pad, ((0, B_pad - B), (0, 0)))
        q_pad = jnp.pad(q_pad, ((0, B_pad - B), (0, 0)))

    kernel = _dtw_kernel(L, r, W_pad)
    out = pl.pallas_call(
        kernel,
        grid=(B_pad // BT,),
        in_specs=[
            pl.BlockSpec((BT, L_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, Q_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BT, W_pad), jnp.float32)],
        interpret=interpret,
    )(a_pad, q_pad)
    return out[:B, 0]


_PALLAS_DTW_STATE = {"ok": None}


def pallas_dtw_available() -> bool:
    """One cached probe compile: can the attached backend lower the kernel?
    (The axon tunnel rejects some Mosaic programs with HTTP 500; CPU has no
    Mosaic at all — engines fall back to the XLA scan formulation.)"""
    if _PALLAS_DTW_STATE["ok"] is None:
        try:
            if jax.default_backend() != "tpu":
                _PALLAS_DTW_STATE["ok"] = False
            else:
                a = jnp.zeros((8, 128), jnp.float32)
                q = jnp.zeros((8, 128), jnp.float32)
                jax.block_until_ready(dtw_banded_pallas_multi(a, q, 4))
                _PALLAS_DTW_STATE["ok"] = True
        except Exception:  # noqa: BLE001 — any lowering failure disables it
            _PALLAS_DTW_STATE["ok"] = False
    return _PALLAS_DTW_STATE["ok"]
