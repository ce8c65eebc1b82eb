"""RSM-DTW engine: raw-subsequence matching under banded dynamic time warping.

TPU-native equivalent of the reference QueryEngineDtw (QueryEngineDtw.java:44-854).
Phase 0/1 reuse the RSM-ED machinery with the query's Lemire envelope as the
per-segment mean *range* (RangeQuerySegment, QueryEngineDtw.java:515-644); phase 2
is the batched LB cascade + banded-DTW kernel (ops/dtw.py) with exact float64
confirmation of near-threshold survivors.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..ops.dtw import dtw_banded_batch, dtw_banded_batch_f64, lb_keogh, lb_kim
from ..plan import QuerySegment, determine_query_plan, envelope, unit_sums
from .. import verify as vf
from .base import _Ctx
from .rsm_ed import QueryEngine


class QueryEngineDtw(QueryEngine):
    use_dtw_cost_model = True

    # ---------------------------------------------------------------- phase 0
    def _plan(self, ctx: _Ctx) -> List[QuerySegment]:
        rho = ctx.params["rho"]
        env_lo, env_hi = envelope(ctx.query, rho)
        sums_lo = unit_sums(env_lo, self.icfg.unit)
        sums_hi = unit_sums(env_hi, self.icfg.unit)
        return determine_query_plan(ctx.length, sums_lo, sums_hi,
                                    self._cost_batch(ctx), self.icfg, self.qcfg)

    # ---------------------------------------------------------------- phase 1
    def _scan(self, seg: QuerySegment, ctx: _Ctx):
        # Reset guard: a stale minimum epsilon above the budget would produce a
        # negative range (QueryEngineDtw.java:210).
        if ctx.last_min_eps > ctx.eps2:
            ctx.last_min_eps = 0.0
        return super()._scan(seg, ctx)

    # ---------------------------------------------------------------- phase 2
    def _verify_multi(self, cand_ivs, ctxs):
        """Fused multi-query DTW verification: LB cascade then banded DP, with
        per-candidate query rows so one launch stream serves the whole batch."""
        import jax
        import jax.numpy as jnp
        from ..ops.dtw import dtw_banded_batch_multi, lb_keogh_multi, lb_kim_multi
        from ..ops.ed import _gather_windows
        from ..utils import intervals as iv

        L = ctxs[0].length
        rho = ctxs[0].params["rho"]
        cand_offs = [iv.expand_offsets({"left": l, "right": r}) for l, r in cand_ivs]
        counts = [o.size for o in cand_offs]
        total = int(sum(counts))
        if total == 0:
            return [(np.empty(0, np.int64), np.empty(0)) for _ in ctxs]
        offsets = np.concatenate(cand_offs)
        qids = np.repeat(np.arange(len(ctxs), dtype=np.int32), counts)
        qm = jnp.asarray(np.stack([c.query for c in ctxs]), jnp.float32)
        envs = [envelope(c.query, rho) for c in ctxs]
        lo_m = jnp.asarray(np.stack([e[0] for e in envs]), jnp.float32)
        hi_m = jnp.asarray(np.stack([e[1] for e in envs]), jnp.float32)
        data_dev = self.data_dev
        threshs = np.array([c.eps2 + vf.guard_threshold(c.eps2, L, self.qcfg.verify_guard)
                            for c in ctxs])

        @jax.jit
        def lb_stage(o, q):
            x = _gather_windows(data_dev, o, L)
            return jnp.maximum(lb_kim_multi(x, qm[q]), lb_keogh_multi(x, lo_m[q], hi_m[q]))

        lb = vf.run_bucketed(lb_stage, total, offsets.astype(np.int32), qids,
                             lo=self.qcfg.verify_batch)
        surv = lb <= threshs[qids]
        s_off, s_qid = offsets[surv], qids[surv]
        per_q = [(np.empty(0, np.int64), np.empty(0)) for _ in ctxs]
        for c, cnt in zip(ctxs, counts):
            c.stats.n_device_checked = cnt
        if s_off.size:
            @jax.jit
            def dtw_stage(o, q):
                x = _gather_windows(data_dev, o, L)
                return dtw_banded_batch_multi(x, qm[q], rho)

            d2 = vf.run_bucketed(dtw_stage, s_off.size, s_off.astype(np.int32),
                                 s_qid, lo=min(self.qcfg.verify_batch, 1024))
            near_mask = d2 <= threshs[s_qid]
            for qi, ctx in enumerate(ctxs):
                near = s_off[near_mask & (s_qid == qi)]
                ctx.stats.n_host_rechecked = int(near.size)
                if near.size == 0:
                    continue
                idx = near[:, None] + np.arange(L)[None, :]
                d2h = dtw_banded_batch_f64(self.data[idx], ctx.query, rho)
                keep = d2h <= ctx.eps2
                per_q[qi] = (near[keep], np.sqrt(d2h[keep]))
        return per_q

    def _verify(self, offsets: np.ndarray, ctx: _Ctx) -> Tuple[np.ndarray, np.ndarray]:
        import jax.numpy as jnp
        rho = ctx.params["rho"]
        L = ctx.length
        q64 = ctx.query
        env_lo, env_hi = envelope(q64, rho)
        q32 = jnp.asarray(q64, jnp.float32)
        lo32 = jnp.asarray(env_lo, jnp.float32)
        hi32 = jnp.asarray(env_hi, jnp.float32)
        data_dev = self.data_dev
        batch = self.qcfg.verify_batch
        thresh = ctx.eps2 + vf.guard_threshold(ctx.eps2, L, self.qcfg.verify_guard)
        ctx.stats.n_device_checked = int(offsets.size)

        # Stage 1+2: cheap lower bounds prune the batch.
        import jax
        from ..ops.ed import _gather_windows

        @jax.jit
        def lb_stage(offs):
            x = _gather_windows(data_dev, offs, L)
            return jnp.maximum(lb_kim(x, q32), lb_keogh(x, lo32, hi32))

        lb = vf.device_distances(offsets, batch, lb_stage)
        survivors = offsets[lb <= thresh]
        if survivors.size == 0:
            return np.empty(0, np.int64), np.empty(0)

        # Stage 3: full banded DTW on survivors.
        @jax.jit
        def dtw_stage(offs):
            x = _gather_windows(data_dev, offs, L)
            return dtw_banded_batch(x, q32, rho)

        d2 = vf.device_distances(survivors, batch, dtw_stage)
        near = survivors[d2 <= thresh]
        ctx.stats.n_host_rechecked = int(near.size)
        if near.size == 0:
            return np.empty(0, np.int64), np.empty(0)
        # Exact float64 confirmation.
        idx = near[:, None] + np.arange(L)[None, :]
        d2h = dtw_banded_batch_f64(self.data[idx], q64, rho)
        keep = d2h <= ctx.eps2
        return near[keep], np.sqrt(d2h[keep])
