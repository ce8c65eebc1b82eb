#!/usr/bin/env python
"""Stage profile of the cNSM-DTW batch at the bench shape (VERDICT r4 next #4).

Wraps the hot stage entry points with wall timers and prints one JSON line
per run: total q/s plus time per stage (plan/phase1, constraint+PAA
prefilters, LB cascade, banded DP, DS confirm, exact host recheck) and the
candidate counts flowing between them.  Drives the tuning that has to find
~1.5x (0.224 -> >=0.3 q/s median) at n=1e6, L=8192, rho=409, nq=16.
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_kvmatch")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp

_ = np.asarray(jnp.ones(16))

from kvmatch_tpu import verify as vf
from kvmatch_tpu.config import IndexConfig, QueryConfig
from kvmatch_tpu.data.generators import generate_series
from kvmatch_tpu.engine.norm_dtw import NormQueryEngineDtw
from kvmatch_tpu.index.build import build_index_tpu

TIMES: dict = {}
COUNTS: dict = {}


def _acc(key, dt, n=None):
    TIMES[key] = TIMES.get(key, 0.0) + dt
    if n is not None:
        COUNTS[key] = COUNTS.get(key, 0) + int(n)


_orig_rb = vf.run_bucketed


def run_bucketed_timed(fn, total, *args, **kw):
    # classify by the free variables of the stage lambda
    names = fn.__code__.co_names
    if "dtw_stage_znorm_ds_multi" in names:
        key = "ds_confirm"
    elif "dtw_stage_znorm_multi" in names:
        key = "banded_dp"
    elif "lb_stage_znorm_multi" in names:
        key = "lb_cascade"
    else:
        key = "run_bucketed_other"
    t0 = time.perf_counter()
    out = _orig_rb(fn, total, *args, **kw)
    jax.block_until_ready(out) if hasattr(out, "block_until_ready") else None
    _acc(key, time.perf_counter() - t0, total)
    return out


vf.run_bucketed = run_bucketed_timed

for name in ("_constraint_prefilter", "_paa_z_prefilter", "_confirm_dtw",
             "_plan_batch"):
    orig = getattr(NormQueryEngineDtw, name)

    def timed(self, *a, _orig=orig, _key=name, **kw):
        t0 = time.perf_counter()
        out = _orig(self, *a, **kw)
        n = None
        if isinstance(out, np.ndarray):
            n = out.size
        elif _key == "_confirm_dtw":
            n = a[0].size
        _acc(_key, time.perf_counter() - t0, n)
        return out

    setattr(NormQueryEngineDtw, name, timed)


def main():
    n = 1_000_000
    L = 8192
    nq = 16
    data = generate_series(n, seed=20260816)
    icfg = IndexConfig()
    qcfg = QueryConfig.tpu_tuned()
    index = build_index_tpu(data, icfg, backend="host")
    eng = NormQueryEngineDtw(data, index=index, icfg=icfg, qcfg=qcfg)
    rng = np.random.default_rng(1)
    offs = rng.integers(0, n - L, nq)
    queries = np.stack([data[o:o + L] for o in offs])
    rho = int(0.05 * L)
    eng.query_batch(queries[:2], 4.0, rho=rho, alpha=1.2, beta=5.0)  # warm
    TIMES.clear(); COUNTS.clear()
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = eng.query_batch(queries, 4.0, rho=rho, alpha=1.2, beta=5.0)
        reps.append(round(nq / (time.perf_counter() - t0), 3))
    found = sum(1 for o, r in zip(offs, res) if int(o) in r.offsets.tolist())
    print(json.dumps({
        "qps_reps": reps, "qps_median": sorted(reps)[1],
        "self_found": f"{found}/{nq}",
        "stage_s": {k: round(v, 2) for k, v in sorted(TIMES.items())},
        "stage_n": COUNTS,
        "p1_ms": round(float(np.mean([r.stats.t_phase1_ms for r in res])), 1),
        "p2_ms": round(float(np.mean([r.stats.t_phase2_ms for r in res])), 1),
        "candidates": int(np.mean([r.stats.n_candidates for r in res])),
        "device_checked": int(np.mean([r.stats.n_device_checked for r in res])),
        "host_rechecked": int(np.sum([r.stats.n_host_rechecked for r in res])),
    }), flush=True)


if __name__ == "__main__":
    main()
