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


def _diag_tile_rows_for(ae_len: int, qe_len: int, W_pad: int) -> int:
    """Candidate rows per grid cell for the anti-diagonal kernel: the two
    expanded inputs are ~2L wide each (double-buffered), carries/temps are
    band-wide."""
    budget = 12 * 1024 * 1024
    per_row = 4 * (2 * (ae_len + qe_len) + 8 * W_pad)
    bt = budget // max(per_row, 1)
    # <=256: the three-phase loop body (edge/mid/edge) keeps ~3 unrolled
    # 128-step bodies of (BT, W_pad) temporaries on Mosaic's scoped-vmem
    # stack; at BT=512 that alone is ~32 MB (measured probe OOM).
    bt = max(8, min(256, (bt // 8) * 8))
    return bt


def _dtw_diag_kernel(L: int, r: int, W_pad: int, PA: int, PQ: int):
    """Anti-diagonal banded-DTW kernel body (closes over static shapes).

    Iterates the band by anti-diagonals s = i + j with lanes pinned to the
    band offset k = j - i + r:

        D_s[k] = d_s[k] + min(D_{s-1}[k-1], D_{s-1}[k+1], D_{s-2}[k])

    — no within-step dependency, so the two log-shift prefix scans of the
    row kernel (14 rolls/row) collapse to two single-lane rolls per step.
    2L-1 steps x ~12 vector ops vs L rows x ~50: fewer total ops AND ~4x
    fewer rolls (the expensive op).  d_s[k] needs a[(s+r-k)/2], q[(s-r+k)/2]
    for the in-parity lanes; with the repeat-interleaved inputs
    ae[t] = a[t//2] (REVERSED, left-padded PA) and qe[t] = q[t//2]
    (left-padded PQ) both become contiguous lane slices whose block bases
    stay 128-aligned (Mosaic's dynamic-slice constraint), exactly like the
    row kernel's aligned-block trick.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = 2 * r + 1
    S = 2 * L - 1                      # anti-diagonal count
    C = 2 * L - 1 - r                  # aer base offset at s=0 (unpadded)

    def kernel(ae_ref, qe_ref, out_ref, d1_ref, d2_ref):
        BT = ae_ref.shape[0]
        kvec = jax.lax.broadcasted_iota(jnp.int32, (BT, W_pad), 1)
        # Ping-pong carries: step s reads D_{s-1} from refs[(s+1)%2] and
        # D_{s-2} from refs[s%2], then overwrites refs[s%2] with D_s — one
        # full (BT, W_pad) VMEM copy per step cheaper than the shift pair
        # (d2 <- d1; d1 <- D) the first version did.
        refs = (d2_ref, d1_ref)          # refs[s%2] for s = 0, 1
        d1_ref[:] = jnp.full((BT, W_pad), BIG, jnp.float32)   # D_{-1}
        # Boot via the s=-2 carry: at s=0 the only predecessor of the active
        # cell (0,0) at lane r is D2[r] = 0 (up/dn pull BIG lanes) — removes
        # the per-step `where(s == 0, ...)` select from all 2L-1 steps.
        d2_ref[:] = jnp.where(kvec == r, 0.0,
                              jnp.full((BT, W_pad), BIG, jnp.float32))
        nblk = -(-S // _ROW_BLK)
        # Middle anti-diagonals r <= s <= 2L-1-r need no per-step range
        # tests: lo clamps to 0 and hi to W-1 there, so lane validity is the
        # CONSTANT in-band mask k < W (dead padding lanes must stay BIG or
        # the two roll wrap-arounds would import garbage into lanes 0 and
        # W-1).  Blocks fully inside that range run a body with zero scalar
        # work and two fewer vector compares per step — ~87% of all steps at
        # the headline shape (L=1024, rho=51).
        band = kvec < W

        def segs(blk):
            # aer block segment covers offsets (PA + C - s) for s in
            # [blk*128, blk*128+127]: start 128-aligned by PA; qe likewise.
            # Aligned DYNAMIC block slice + STATIC in-block slices — Mosaic's
            # dynamic-slice bases must stay 128-aligned.
            a0 = pl.multiple_of(PA + C - (_ROW_BLK - 1) - blk * _ROW_BLK,
                                _ROW_BLK)
            q0 = pl.multiple_of(PQ + blk * _ROW_BLK - r, _ROW_BLK)
            return (ae_ref[:, pl.ds(a0, W_pad + _ROW_BLK)],
                    qe_ref[:, pl.ds(q0, W_pad + _ROW_BLK)])

        def step(aseg, qseg, t, valid):
            # s % 2 == t % 2 (blocks are _ROW_BLK=128 steps, even), so the
            # ping-pong role is the PYTHON-level unroll parity — no traced
            # tuple indexing.
            A = jax.lax.slice_in_dim(
                aseg, _ROW_BLK - 1 - t, _ROW_BLK - 1 - t + W_pad, axis=1)
            Qv = jax.lax.slice_in_dim(qseg, t, t + W_pad, axis=1)
            d = (A - Qv) ** 2
            D1 = refs[(t + 1) % 2][:]
            # Dead lanes (k >= W) and out-of-range lanes hold BIG, so the
            # roll wrap-arounds import BIG on their own — no edge fixup
            # selects needed (W < W_pad always: W is odd).
            up = pltpu.roll(D1, 1, 1)            # lane k <- D1[k-1]
            dn = pltpu.roll(D1, W_pad - 1, 1)    # lane k <- D1[k+1]
            M = jnp.minimum(jnp.minimum(up, dn), refs[t % 2][:])
            # d + BIG == BIG exactly in f32 (d << 1e30 ulp), so the carry
            # cannot drift upward across steps without a cap.
            refs[t % 2][:] = jnp.where(valid, d + M, BIG)

        def edge_body(blk, _):
            aseg, qseg = segs(blk)
            for t in range(_ROW_BLK):
                s = blk * _ROW_BLK + t

                @pl.when(s < S)
                def _():
                    # Lane validity needs only a [lo, hi] range test against
                    # per-step SCALARS: k <= s+r and k > s+r-2L (i in
                    # range), r-s <= k <= 2L-1+r-s (j in range), k <= 2r (in
                    # band).  The parity test ((s+r-k) even) is DROPPED on
                    # purpose: rolls move values between adjacent lanes,
                    # which flips parity in lockstep with s, so wrong-parity
                    # lanes form a closed garbage computation that never
                    # feeds an active lane; the final read at lane r on
                    # diagonal 2L-2 is active-parity.
                    lo = jnp.maximum(jnp.maximum(r - s, s + r - 2 * L + 1), 0)
                    hi = jnp.minimum(jnp.minimum(s + r, 2 * L - 1 + r - s),
                                     W - 1)
                    step(aseg, qseg, t, (kvec >= lo) & (kvec <= hi))
            return 0

        def mid_body(blk, _):
            aseg, qseg = segs(blk)
            for t in range(_ROW_BLK):
                step(aseg, qseg, t, band)
            return 0

        # Block b is "middle" iff all its steps exist (s < S) and satisfy
        # r <= s <= 2L-1-r (lo/hi clamp to the constant band there).
        smax = min(2 * L - 1 - r, S - 1)
        mid_lo = min(-(-r // _ROW_BLK), nblk)
        mid_hi = max((smax - _ROW_BLK + 1) // _ROW_BLK + 1, mid_lo)
        mid_hi = min(mid_hi, nblk)
        jax.lax.fori_loop(0, mid_lo, edge_body, 0)
        jax.lax.fori_loop(mid_lo, mid_hi, mid_body, 0)
        jax.lax.fori_loop(mid_hi, nblk, edge_body, 0)
        final = refs[(S - 1) % 2]
        out_ref[:] = jnp.broadcast_to(final[:, r][:, None], out_ref.shape)

    return kernel


@functools.partial(jax.jit, static_argnames=("r", "interpret"))
def dtw_banded_pallas_diag_multi(a_batch: jnp.ndarray, q_batch: jnp.ndarray,
                                 r: int, interpret: bool = False
                                 ) -> jnp.ndarray:
    """Anti-diagonal banded DTW, per-row query: a_batch (B, L) vs (B, L).

    Same distances as dtw_banded_pallas_multi / ops/dtw.dtw_banded_batch_multi
    up to f32 summation order (absorbed by the engines' guard bands); ~2x
    higher throughput by replacing the per-row prefix scans with the
    scan-free anti-diagonal recurrence."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L = a_batch.shape
    r = min(r, L - 1)
    W = 2 * r + 1
    W_pad = _round_up(W, 128)
    C = 2 * L - 1 - r

    # ae = reversed repeat-interleave of a; qe = repeat-interleave of q.
    # Active lanes read u = 2L-1-2i (odd), so ae[u] = a[L-1-u//2] = a[i].
    ae = jnp.repeat(a_batch[:, ::-1], 2, axis=1)         # ae[u] = a[L-1-u//2]
    qe = jnp.repeat(q_batch, 2, axis=1)                  # qe[t] = q[t//2]
    # Left pads making every 128-step block's slice base 128-aligned and all
    # segment starts non-negative: the LAST (possibly partial) block's aligned
    # start PA + C - 127 - 128*(nblk-1) is the binding constraint.
    S = 2 * L - 1
    nblk = -(-S // _ROW_BLK)
    PA0 = max(_ROW_BLK * nblk - 2 * L + r, 0)
    PA = PA0 + ((-(PA0 + C - (_ROW_BLK - 1))) % _ROW_BLK)
    PQ = r  # (PQ - r) % 128 == 0 and covers the s < r negative bases
    # widest reads: aer blk=0 start PA+C-127, width W_pad+128; qe last block
    ae_len = _round_up(PA + 2 * L + W_pad + _ROW_BLK, 128)
    qe_len = _round_up(PQ + nblk * _ROW_BLK - r + W_pad + _ROW_BLK, 128)
    ae = jnp.pad(ae, ((0, 0), (PA, ae_len - PA - 2 * L)))
    qe = jnp.pad(qe, ((0, 0), (PQ, qe_len - PQ - 2 * L)))

    BT = _diag_tile_rows_for(ae_len, qe_len, W_pad)
    B_pad = _round_up(B, BT)
    if B_pad != B:
        ae = jnp.pad(ae, ((0, B_pad - B), (0, 0)))
        qe = jnp.pad(qe, ((0, B_pad - B), (0, 0)))

    kernel = _dtw_diag_kernel(L, r, W_pad, PA, PQ)
    out = pl.pallas_call(
        kernel,
        grid=(B_pad // BT,),
        in_specs=[
            pl.BlockSpec((BT, ae_len), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, qe_len), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B_pad, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BT, W_pad), jnp.float32),
                        pltpu.VMEM((BT, W_pad), jnp.float32)],
        interpret=interpret,
        # The default 16 MB scoped-vmem cap counts every unrolled step's
        # temporaries across the three loop bodies; the data blocks above are
        # sized to ~12 MB, so give Mosaic headroom for its stack.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(ae, qe)
    return out[:B, 0]


_PALLAS_DTW_STATE = {"ok": None, "variant": None}


def pallas_dtw_available() -> bool:
    """One cached probe compile per variant: can the attached backend lower
    the kernels?  (The axon tunnel rejects some Mosaic programs with HTTP
    500; CPU has no Mosaic at all — engines fall back to the XLA scan
    formulation.)  Prefers the anti-diagonal kernel (scan-free, ~2x the row
    kernel's throughput), falls back to the row kernel."""
    if _PALLAS_DTW_STATE["ok"] is None:
        _PALLAS_DTW_STATE["ok"] = False
        if jax.default_backend() == "tpu":
            a = jnp.zeros((8, 128), jnp.float32)
            q = jnp.zeros((8, 128), jnp.float32)
            for variant, fn in (("diag", dtw_banded_pallas_diag_multi),
                                ("rows", dtw_banded_pallas_multi)):
                try:
                    jax.block_until_ready(fn(a, q, 4))
                    _PALLAS_DTW_STATE.update(ok=True, variant=variant)
                    break
                except Exception:  # noqa: BLE001 — lowering failure: next
                    continue
    return _PALLAS_DTW_STATE["ok"]


def dtw_banded_pallas(a_batch: jnp.ndarray, q_batch: jnp.ndarray, r: int,
                      interpret: bool = False) -> jnp.ndarray:
    """Best available Pallas banded-DTW variant (probe-selected)."""
    if _PALLAS_DTW_STATE.get("variant") == "rows":
        return dtw_banded_pallas_multi(a_batch, q_batch, r,
                                       interpret=interpret)
    return dtw_banded_pallas_diag_multi(a_batch, q_batch, r,
                                        interpret=interpret)
