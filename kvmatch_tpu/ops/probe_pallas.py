"""Pallas TPU kernel for the dense phase-1 probe: fused bound + flag emission.

The XLA fly probe (parallel/query.py:make_dense_probe_step_flags) evaluates
the accumulated epsilon lower bound for every position with per-segment
TRACED addressing — a traced row pick into the bucket stack plus a
traced-start shift.  XLA cannot fuse traced addressing: every segment's
shifted window materializes through HBM, and the probe runs ~8.6-10.6 s/pass
at n=1e8, Q=8 on a v5e, 300x over the fused floor (~0.03 s measured with
trace-time-constant addressing).  This kernel IS that fused pass:

  grid step = one T-position tile.  The bucket stack tile (all S scales, with
  an nv-tile halo for segment shifts) arrives in VMEM via BlockSpec
  pipelining (nv shifted views of the same array — the axon backend rejects
  manual dynamic-offset HBM DMAs, dtw_pallas.py:18).  Per query, a fori_loop
  over the padded segment table addresses each segment's shifted window IN
  REGISTERS:

    row pick      : S-way select over the scale rows           (static)
    shift // 128  : log2(nv*RT)-stage conditional sublane barrel of
                    STATIC rolls                               (static rolls)
    shift %  128  : ONE dynamic lane rotate (tpu.dynamic_rotate is 2-D-only
                    and lane-axis only on this backend)        (dynamic roll)
    tile boundary : lane-iota select between adjacent row windows

  and accumulates the z-space bound (and the Ex/Ex2 std-filter tracks for
  the cNSM variant) without touching HBM.  Each tile emits per-FLAG_BLOCK
  candidate flags (the overflow-proof bitmap phase 2 rejects over-coverage
  from) and exact per-query counts (SMEM accumulator) — identical semantics
  to the XLA flags step, at flag granularity F = 128 (one flag per lane row).

Numerics match parallel/query.py:_dense_probe_norm / _dense_probe op-for-op
in f32; bucket windows are built by the same XLA build_buckets outside the
kernel, so phase-1 soundness (probe_guard slack) is unchanged.

Reference: the probe replaces the index KV range scans + interval
intersection of QueryEngine.java:270-327 / NormQueryEngine.java:120-180 in
flood regimes where host interval algebra is the bottleneck.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 8192          # positions per grid step
LANES = 128
RT = TILE // LANES   # 64 sublane rows per tile
FLAG = 128           # flag granularity: one flag per lane row


def views_for(length: int, unit: int) -> int:
    """How many RT-row tile views cover a tile plus the max segment shift."""
    a_max = (length - unit + LANES - 1) // LANES
    rows = a_max + RT + 1
    return max(2, -(-rows // RT))


def _probe_kernel(Q: int, S: int, s_seg: int, nv: int, qp: int, length: int,
                  unit: int, d: float, slack: float, norm: bool):
    NROWS = nv * RT
    FL = TILE // FLAG            # = RT flags per tile (one per lane row)
    d32 = np.float32(d)
    slack32 = np.float32(slack)
    unit32 = np.float32(unit)
    qlen32 = np.float32(length)
    INF = np.float32(np.inf)

    def kernel(iscal_ref, iscale_ref, iorder_ref, ivalid_ref,
               fmlo_ref, fmhi_ref, fwidth_ref, feps2_ref, fcons_ref,
               *view_and_out_refs):
        view_refs = view_and_out_refs[:nv]
        flags_ref, counts_ref, xs_ref = view_and_out_refs[nv:]
        t = pl.program_id(0)
        p0 = iscal_ref[0, 0]
        m = iscal_ref[0, 1]

        @pl.when(t == 0)
        def _init_counts():
            for q in range(qp):
                counts_ref[q, 0] = jnp.int32(0)

        # Stage the tile's bucket rows scale-major into VMEM scratch so each
        # segment's shifted window is ONE dynamic sublane load (replaces the
        # S-way select + log2(NROWS) conditional-roll barrel, which cost ~5x
        # the arithmetic at S=5).
        for k, vr in enumerate(view_refs):
            for s in range(S):
                xs_ref[s * NROWS + k * RT: s * NROWS + (k + 1) * RT, :] = vr[s]
        lane = jax.lax.broadcasted_iota(jnp.int32, (RT, LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (RT, LANES), 0)
        pos = p0 + t * TILE + row * LANES + lane
        zeros = jnp.zeros((RT, LANES), jnp.float32)
        flags_ref[0] = jnp.zeros((qp, FL), jnp.float32)

        for q in range(Q):
            alpha = fcons_ref[q, 0]
            beta = fcons_ref[q, 1]
            mu_q = fcons_ref[q, 2]
            sd_q = fcons_ref[q, 3]
            s_small = sd_q / alpha
            s_big = alpha * sd_q
            # scalar reciprocals (see parallel/query._dense_probe_norm: the
            # vector forms below multiply instead of divide; identical math)
            inv_big = np.float32(1.0) / s_big
            inv_small = np.float32(1.0) / s_small
            inv_sd = np.float32(1.0) / sd_q

            def seg_body(s, carry):
                acc, exlo, exup, ex2lo, punits = carry
                sidx = iscale_ref[q, s]
                order = iorder_ref[q, s]
                valid = (ivalid_ref[q, s] != 0)
                vmul = jnp.where(valid, np.float32(1.0), np.float32(0.0))
                shift = (order - 1) * unit
                a = shift // LANES
                b = shift % LANES
                # row pick + sublane shift: one dynamic VMEM load
                rows = xs_ref[pl.ds(sidx * NROWS + a, RT + 1), :]
                # lane remainder: one dynamic rotate + boundary select
                rolled = pltpu.roll(rows, LANES - b, axis=1)
                bw = jnp.where((lane + b) < LANES,
                               rolled[:RT], rolled[1:RT + 1]).astype(jnp.float32)
                key_lo = bw * d32 - slack32
                key_hi = key_lo + d32 + 2 * slack32
                mlo = fmlo_ref[q, s]
                mhi = fmhi_ref[q, s]
                width = fwidth_ref[q, s]
                k_units = width / unit32
                if norm:
                    n_lo = key_lo - (mu_q + beta)
                    n_hi = key_hi - (mu_q - beta)
                    # branch-free z picks: inv_small >= inv_big > 0 (alpha
                    # >= 1), so the sign-dependent where-selects collapse to
                    # min/max over the two products — same value, 1 op fewer
                    # each on the kernel's hot path.
                    z_lo = jnp.minimum(n_lo * inv_big, n_lo * inv_small)
                    z_hi = jnp.maximum(n_hi * inv_small, n_hi * inv_big)
                    zq_lo = (mlo - mu_q) * inv_sd
                    zq_hi = (mhi - mu_q) * inv_sd
                    delta = jnp.maximum(
                        jnp.maximum(z_lo - zq_hi, zq_lo - z_hi), 0.0)
                    acc = acc + vmul * (width * delta * delta)
                    exlo = exlo + vmul * (key_lo * k_units)
                    exup = exup + vmul * (key_hi * k_units)
                    # sq = min-|value| of the [key_lo, key_hi] interval,
                    # squared: key_lo > 0 -> key_lo^2, key_hi < 0 -> key_hi^2,
                    # straddling zero -> 0.  max+min form: 4 ops vs 6.
                    sq_r = jnp.maximum(key_lo, 0.0) + jnp.minimum(key_hi, 0.0)
                    ex2lo = ex2lo + vmul * (sq_r * sq_r * k_units)
                    punits = punits + vmul * k_units
                else:
                    delta = jnp.maximum(
                        jnp.maximum(key_lo - mhi, mlo - key_hi), 0.0)
                    acc = acc + vmul * (width * delta * delta)
                return acc, exlo, exup, ex2lo, punits

            carry0 = (zeros, zeros, zeros, zeros, jnp.float32(0.0))
            acc, exlo, exup, ex2lo, punits = jax.lax.fori_loop(
                0, s_seg, seg_body, carry0)

            if norm:
                punits = jnp.maximum(punits, 1.0)
                rest = qlen32 - punits * unit32
                limit = (alpha * sd_q) ** 2 + np.float32(1e-6)
                mean_lo = exlo / punits
                mean_up = exup / punits
                over = mean_lo > mu_q + beta
                under = mean_up < mu_q - beta
                rest_s = jnp.maximum(rest, 1.0)
                nv_o = mu_q + beta - (mean_lo - (mu_q + beta)) * punits * unit32 / rest_s
                var_o = (ex2lo * unit32 + rest * nv_o * nv_o) / qlen32 \
                    - (mu_q + beta) ** 2
                nv_u = mu_q - beta + ((mu_q - beta) - mean_up) * punits * unit32 / rest_s
                var_u = (ex2lo * unit32 + rest * nv_u * nv_u) / qlen32 \
                    - (mu_q - beta) ** 2
                # Pure boolean algebra (no jnp.where over bool vectors —
                # Mosaic rejects the i8->i1 select/trunc it lowers to).
                rest_pos = rest > 0  # scalar
                bad_rest = (over & (var_o > limit)) | (under & (var_u > limit))
                bad_flat = (over & ((mean_lo - (mu_q + beta)) ** 2 > limit)) \
                    | (under & (((mu_q - beta) - mean_up) ** 2 > limit))
                std_bad = (rest_pos & bad_rest) | (~rest_pos & bad_flat)
                acc = jnp.where(std_bad, INF, acc)

            mask = (acc <= feps2_ref[q, 0]) & (pos < m)
            counts_ref[q, 0] += jnp.sum(mask.astype(jnp.int32))
            flags_ref[0, q, :] = jnp.any(mask, axis=1).astype(jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "length", "unit", "d", "slack", "norm", "interpret"))
def probe_flags_tiles(bwin3, iscale, iorder, ivalid, fmlo, fmhi, fwidth,
                      feps2, fcons, iscal, *, length: int, unit: int,
                      d: float, slack: float, norm: bool,
                      interpret: bool = False):
    """Fused probe over one position block.

    bwin3: (S, WR, 128) i32 bucket rows, WR = (NT + nv - 1) * RT where
    NT = block positions / TILE (halo columns padded by the caller with
    prune-everything fill).  Segment tables (Q, S_SEG) i32/f32; feps2 (Q, 1);
    fcons (Q, 4); iscal (1, 2) = [block p0, m].  Returns
    (flags (NT, QP, TILE//FLAG) f32 0/1, counts (QP, 1) i32)."""
    S, WR, _ = bwin3.shape
    Q, S_SEG = iscale.shape
    nv = views_for(length, unit)
    NT = WR // RT - (nv - 1)
    qp = 8 * ((Q + 7) // 8)
    if Q < qp:  # pad the q-indexed SMEM tables to the padded row count
        padq = qp - Q
        iscale, iorder, ivalid, fmlo, fmhi, fwidth = (
            jnp.pad(a, ((0, padq), (0, 0)))
            for a in (iscale, iorder, ivalid, fmlo, fmhi, fwidth))
        feps2 = jnp.pad(feps2, ((0, padq), (0, 0)))
        fcons = jnp.pad(fcons, ((0, padq), (0, 0)),
                        constant_values=np.float32(1.0))
    FL = TILE // FLAG
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    view = lambda k: pl.BlockSpec((S, RT, LANES), lambda t, k=k: (0, t + k, 0))
    flags, counts = pl.pallas_call(
        _probe_kernel(Q, S, S_SEG, nv, qp, length, unit, d, slack, norm),
        grid=(NT,),
        in_specs=[smem() for _ in range(9)] + [view(k) for k in range(nv)],
        out_specs=[
            pl.BlockSpec((1, qp, FL), lambda t: (t, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NT, qp, FL), jnp.float32),
            jax.ShapeDtypeStruct((qp, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S * nv * RT, LANES), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(iscal, iscale, iorder, ivalid, fmlo, fmhi, fwidth, feps2, fcons,
      *([bwin3] * nv))
    return flags[:, :Q, :], counts[:Q, 0]


_PROBE_STATE = {"ok": None}


def pallas_probe_available() -> bool:
    """One cached probe compile: can the attached backend lower the probe
    kernel?  (The axon tunnel rejects some Mosaic programs; CPU has no
    Mosaic — the engine falls back to the XLA flags step.)"""
    if _PROBE_STATE["ok"] is None:
        _PROBE_STATE["ok"] = False
        if jax.default_backend() == "tpu":
            try:
                S, L, Q = 5, 512, 1
                nv = views_for(L, 25)
                bwin3 = jnp.zeros((S, (1 + nv - 1) * RT, LANES), jnp.int32)
                z = jnp.zeros((Q, 2), jnp.int32)
                zf = jnp.zeros((Q, 2), jnp.float32)
                r = probe_flags_tiles(
                    bwin3, z, jnp.ones((Q, 2), jnp.int32), z, zf, zf,
                    jnp.ones((Q, 2), jnp.float32),
                    jnp.ones((Q, 1), jnp.float32),
                    jnp.ones((Q, 4), jnp.float32),
                    jnp.asarray([[0, TILE]], jnp.int32),
                    length=L, unit=25, d=0.05, slack=0.01, norm=True)
                jax.block_until_ready(r)
                _PROBE_STATE["ok"] = True
            except Exception:  # noqa: BLE001 — lowering failure: XLA path
                pass
    return _PROBE_STATE["ok"]
