"""cNSM-DTW engine: constrained normalized matching under banded DTW.

TPU-native equivalent of the reference NormQueryEngineDtw
(NormQueryEngineDtw.java:44-1065) — the union of the cNSM machinery
(alpha/beta probe bounds, Ex/Ex2 std-filter, beta partitions) and the DTW
machinery (envelope segments, LB cascade, banded DP on z-normalized windows).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..ops.dtw import dtw_banded_batch, dtw_banded_batch_f64, lb_keogh, lb_kim
from ..plan import QuerySegment, determine_query_plan, envelope, unit_sums
from .. import verify as vf
from .base import _Ctx
from .norm_ed import NormQueryEngine


class NormQueryEngineDtw(NormQueryEngine):

    # ---------------------------------------------------------------- phase 0
    def _plan(self, ctx: _Ctx) -> List[QuerySegment]:
        q = ctx.query
        mu_q = float(q.mean())
        sd_q = float(np.sqrt(max(np.mean(q * q) - mu_q * mu_q, 0.0)))
        ctx.params["_mu_q"], ctx.params["_sd_q"] = mu_q, sd_q
        rho = ctx.params["rho"]
        env_lo, env_hi = envelope(q, rho)
        sums_lo = unit_sums(env_lo, self.icfg.unit)
        sums_hi = unit_sums(env_hi, self.icfg.unit)
        return determine_query_plan(ctx.length, sums_lo, sums_hi,
                                    self._cost_batch(ctx), self.icfg, self.qcfg)

    # ---------------------------------------------------------------- phase 2
    def _verify_multi(self, cand_ivs, ctxs):
        """Fused multi-query cNSM-DTW: exact host constraint prefilter, then
        z-normalized LB cascade + banded DP with per-candidate query rows."""
        import jax
        import jax.numpy as jnp
        from ..ops.dtw import dtw_banded_batch_multi, lb_keogh_multi, lb_kim_multi
        from ..ops.ed import _gather_windows

        L = ctxs[0].length
        rho = ctxs[0].params["rho"]
        from ..utils import intervals as iv
        cand_offs = [self._constraint_prefilter(
            iv.expand_offsets({"left": l, "right": r}), c)
            for (l, r), c in zip(cand_ivs, ctxs)]
        counts = [o.size for o in cand_offs]
        total = int(sum(counts))
        if total == 0:
            return [(np.empty(0, np.int64), np.empty(0)) for _ in ctxs]
        offsets = np.concatenate(cand_offs)
        qids = np.repeat(np.arange(len(ctxs), dtype=np.int32), counts)
        zqs = np.stack([(c.query - c.params["_mu_q"]) / c.params["_sd_q"]
                        for c in ctxs])
        envs = [envelope(z, rho) for z in zqs]
        zq_m = jnp.asarray(zqs, jnp.float32)
        lo_m = jnp.asarray(np.stack([e[0] for e in envs]), jnp.float32)
        hi_m = jnp.asarray(np.stack([e[1] for e in envs]), jnp.float32)
        data_dev = self.data_dev
        threshs = np.array([c.eps2 + vf.guard_threshold(c.eps2, L, self.qcfg.verify_guard)
                            for c in ctxs])

        def _znorm(x):
            inv_l = np.float32(1.0 / L)
            mean = jnp.sum(x, axis=1) * inv_l
            centered = x - mean[:, None]
            var = jnp.sum(centered * centered, axis=1) * inv_l
            std = jnp.sqrt(jnp.maximum(var, 1e-30))
            return centered / std[:, None]

        @jax.jit
        def lb_stage(o, q):
            z = _znorm(_gather_windows(data_dev, o, L))
            return jnp.maximum(lb_kim_multi(z, zq_m[q]),
                               lb_keogh_multi(z, lo_m[q], hi_m[q]))

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
                z = _znorm(_gather_windows(data_dev, o, L))
                return dtw_banded_batch_multi(z, zq_m[q], rho)

            d2 = vf.run_bucketed(dtw_stage, s_off.size, s_off.astype(np.int32),
                                 s_qid, lo=min(self.qcfg.verify_batch, 1024))
            near_mask = d2 <= threshs[s_qid]
            for qi, ctx in enumerate(ctxs):
                near = s_off[near_mask & (s_qid == qi)]
                ctx.stats.n_host_rechecked = int(near.size)
                if near.size == 0:
                    continue
                per_q[qi] = self._confirm_dtw(near, ctx)
        return per_q

    def _confirm_dtw(self, near: np.ndarray, ctx: _Ctx):
        """Exact float64 confirmation: constraints + banded DTW on z-normed windows."""
        rho = ctx.params["rho"]
        alpha = ctx.params["alpha"]
        beta = ctx.params["beta"]
        mu_q, sd_q = ctx.params["_mu_q"], ctx.params["_sd_q"]
        L = ctx.length
        zq = (ctx.query - mu_q) / sd_q
        idx = near[:, None] + np.arange(L)[None, :]
        x = self.data[idx]
        mu_h = x.mean(axis=1)
        var_h = np.maximum(np.mean(x * x, axis=1) - mu_h * mu_h, 0.0)
        sd_h = np.sqrt(var_h)
        ratio_h = sd_h / sd_q
        ok_h = (np.abs(mu_h - mu_q) <= beta) & (ratio_h <= alpha) & \
               (ratio_h >= 1.0 / alpha) & (sd_h > 0)
        z = (x - mu_h[:, None]) / np.where(sd_h > 0, sd_h, 1.0)[:, None]
        d2h = dtw_banded_batch_f64(z, zq, rho)
        keep = ok_h & (d2h <= ctx.eps2)
        return near[keep], np.sqrt(d2h[keep])

    def _verify(self, offsets: np.ndarray, ctx: _Ctx) -> Tuple[np.ndarray, np.ndarray]:
        import jax
        import jax.numpy as jnp
        from ..ops.ed import _gather_windows

        offsets = self._constraint_prefilter(offsets, ctx)
        if offsets.size == 0:
            return np.empty(0, np.int64), np.empty(0)
        rho = ctx.params["rho"]
        alpha = ctx.params["alpha"]
        beta = ctx.params["beta"]
        mu_q, sd_q = ctx.params["_mu_q"], ctx.params["_sd_q"]
        L = ctx.length
        zq = (ctx.query - mu_q) / sd_q
        env_lo, env_hi = envelope(zq, rho)  # envelope of the z-normed query
                                            # (NormQueryEngineDtw.java:467-469)
        zq32 = jnp.asarray(zq, jnp.float32)
        lo32 = jnp.asarray(env_lo, jnp.float32)
        hi32 = jnp.asarray(env_hi, jnp.float32)
        data_dev = self.data_dev
        batch = self.qcfg.verify_batch
        thresh = ctx.eps2 + vf.guard_threshold(ctx.eps2, L, self.qcfg.verify_guard)
        cg = 1e-3 * (1.0 + abs(mu_q) + sd_q)
        ctx.stats.n_device_checked = int(offsets.size)

        @jax.jit
        def lb_stage(offs):
            x = _gather_windows(data_dev, offs, L)
            inv_l = np.float32(1.0 / L)
            mean = jnp.sum(x, axis=1) * inv_l
            centered = x - mean[:, None]
            var = jnp.sum(centered * centered, axis=1) * inv_l
            std = jnp.sqrt(var)
            safe = jnp.where(std > 0, std, 1.0)
            z = centered / safe[:, None]
            ratio = std / np.float32(sd_q)
            ok = ((jnp.abs(mean - mu_q) <= beta + cg) & (ratio <= alpha + cg)
                  & (ratio >= 1.0 / alpha - cg) & (std > 0))
            lb = jnp.maximum(lb_kim(z, zq32), lb_keogh(z, lo32, hi32))
            return jnp.where(ok, lb, np.float32(np.inf))

        lb = vf.device_distances(offsets, batch, lb_stage)
        survivors = offsets[lb <= thresh]
        if survivors.size == 0:
            return np.empty(0, np.int64), np.empty(0)

        @jax.jit
        def dtw_stage(offs):
            x = _gather_windows(data_dev, offs, L)
            inv_l = np.float32(1.0 / L)
            mean = jnp.sum(x, axis=1) * inv_l
            centered = x - mean[:, None]
            var = jnp.sum(centered * centered, axis=1) * inv_l
            std = jnp.sqrt(jnp.maximum(var, 1e-30))
            z = centered / std[:, None]
            return dtw_banded_batch(z, zq32, rho)

        d2 = vf.device_distances(survivors, batch, dtw_stage)
        near = survivors[d2 <= thresh]
        ctx.stats.n_host_rechecked = int(near.size)
        if near.size == 0:
            return np.empty(0, np.int64), np.empty(0)
        # Exact float64 confirmation: constraints + banded DTW on z-normed windows.
        idx = near[:, None] + np.arange(L)[None, :]
        x = self.data[idx]
        mu_h = x.mean(axis=1)
        var_h = np.maximum(np.mean(x * x, axis=1) - mu_h * mu_h, 0.0)
        sd_h = np.sqrt(var_h)
        ratio_h = sd_h / sd_q
        ok_h = (np.abs(mu_h - mu_q) <= beta) & (ratio_h <= alpha) & \
               (ratio_h >= 1.0 / alpha) & (sd_h > 0)
        z = (x - mu_h[:, None]) / np.where(sd_h > 0, sd_h, 1.0)[:, None]
        d2h = dtw_banded_batch_f64(z, zq, rho)
        keep = ok_h & (d2h <= ctx.eps2)
        return near[keep], np.sqrt(d2h[keep])
