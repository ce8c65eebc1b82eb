#!/usr/bin/env python
"""Reference-scale selectivity evaluation at n=1e8, CALIBRATED workloads
(VERDICT r4 next #8).

The reference evaluates 100 queries per answer-selectivity decade
(QueryTestGroupBySelectivity.java:36-44).  Random (offset, eps) sweeps
cannot fill the upper decades on smooth random-walk data — answer counts
jump from 1 (the self-match) to millions as eps crosses the local density
threshold — so this driver CONSTRUCTS the workload the way the reference's
generators do: for each of 100 random offsets it computes the full distance
profile of the query against every window ON DEVICE (one MXU correlation
scan + running top-K, ~1.6e12 flop/query), then picks eps per decade as the
mid-gap quantile targeting 3x10^(d+8) answers (mid-decade).  Each decade is
then replayed as one timed 100-query batch through the serving engine
(stats-only device index + fused Pallas flag probe) and reports
T/T1/T2/#candidates/#answers and false dismissals (a query's own offset
missing from its answer set).

Output: one JSON line per section; the `*_decade` lines feed
docs/results_r5.md.
"""
import argparse
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


def log(**kw):
    print(json.dumps(kw), flush=True)


from kvmatch_tpu.config import IndexConfig, QueryConfig
from kvmatch_tpu.data.generators import generate_series
from kvmatch_tpu.engine.norm_ed import NormQueryEngine
from kvmatch_tpu.engine.rsm_ed import QueryEngine
from kvmatch_tpu.index.device_build import build_index_device_stats
from kvmatch_tpu.ops.regions import (region_ed_distances,
                                     region_znorm_distances)

_ap = argparse.ArgumentParser()
_ap.add_argument("--n", type=int, default=100_000_000)
_ap.add_argument("--per-decade", type=int, default=100)
_args = _ap.parse_args()

N = _args.n
L = 8192
PER_DECADE = _args.per_decade
DECADES = (-8, -7, -6, -5)
TARGET = {d: 3 * 10 ** (d + 8) for d in DECADES}   # mid-decade answer counts
K = 4096                                           # > max target
M = 4096                                           # windows per region row
B = 64                                             # region rows per chunk

icfg = IndexConfig()
qcfg = QueryConfig.tpu_tuned(dense_probe_min_count=0)

t0 = time.perf_counter()
data = generate_series(N, seed=20260817)
index = build_index_device_stats(data, icfg)
log(section="setup", sec=round(time.perf_counter() - t0, 1))

m = N - L + 1
nstart = -(-m // M)
starts_np = np.minimum(np.arange(nstart, dtype=np.int64) * M,
                       N - (M + L - 1)).astype(np.int32)
nch = -(-nstart // B)
starts_np = np.pad(starts_np, (0, nch * B - nstart),
                   constant_values=starts_np[-1])
_center = float(np.mean(data[:262144]))


def _topk_scan(kind):
    """One-launch device scan: running top-K smallest distances (and, for
    every chunk, constraint-masked for cnsm) over all m windows."""
    starts_dev = jnp.asarray(starts_np.reshape(nch, B))

    @jax.jit
    def run(data_dev, q32, cons):
        def body(i, best):
            s_ = starts_dev[i]
            if kind == "rsm":
                d2, _ = region_ed_distances(data_dev, q32, s_, L, M,
                                            np.float32(_center))
            else:
                d2, mean, std = region_znorm_distances(data_dev, q32, s_, L, M)
                alpha, beta, mu_q, sd_q = cons[0], cons[1], cons[2], cons[3]
                ok = ((jnp.abs(mean - mu_q) <= beta)
                      & (std <= alpha * sd_q) & (std >= sd_q / alpha))
                d2 = jnp.where(ok, d2, jnp.inf)
            # Exact per-row coverage mask: row g owns positions
            # [g*M, min((g+1)*M, m)).  Clamped tail rows and the chunk
            # padding repeat windows; without this mask the repeats inflate
            # the top-K counts.
            pos = s_[:, None] + jnp.arange(M, dtype=jnp.int32)[None, :]
            g = i * B + jnp.arange(B, dtype=jnp.int32)[:, None]
            keep = (pos >= g * M) & (pos < jnp.minimum((g + 1) * M, m))
            d2 = jnp.where(keep, d2, jnp.inf)
            cand = jnp.concatenate([best, -d2.reshape(-1)])
            best2, _ = jax.lax.top_k(cand, K)
            return best2

        best = jnp.full(K, -jnp.inf, jnp.float32)
        best = jax.lax.fori_loop(0, nch, body, best)
        return -best  # ascending after sort on host

    return run


def calibrate(kind, offs, data_dev):
    scan = _topk_scan(kind)
    eps_by_decade = {d: [] for d in DECADES}
    t0 = time.perf_counter()
    for j, o in enumerate(offs):
        q = data[o:o + L]
        if kind == "rsm":
            q32 = jnp.asarray(q - _center, jnp.float32)
            cons = jnp.zeros(4, jnp.float32)
        else:
            mu_q = q.mean()
            sd_q = float(np.sqrt(max(np.mean(q * q) - mu_q * mu_q, 0.0)))
            q32 = jnp.asarray((q - mu_q) / sd_q, jnp.float32)
            cons = jnp.asarray([1.2, 5.0, mu_q, sd_q], jnp.float32)
        ds = np.sort(np.asarray(scan(data_dev, q32, cons)))
        fin = ds[np.isfinite(ds)]
        for d in DECADES:
            k = min(TARGET[d], fin.size)  # cnsm: constraint set may be small
            lo = fin[k - 1]
            hi = fin[k] if k < fin.size else lo * 1.02 + 1e-3
            eps_by_decade[d].append(float(np.sqrt((lo + hi) / 2.0)))
        if (j + 1) % 25 == 0:
            log(section=f"{kind}_calibrate", done=j + 1,
                sec=round(time.perf_counter() - t0, 1))
    return eps_by_decade


def replay(eng, name, offs, eps_by_decade, params):
    queries = np.stack([data[o:o + L] for o in offs])
    for d in DECADES:
        eps = np.asarray(eps_by_decade[d])
        t0 = time.perf_counter()
        res = eng.query_batch(queries, eps, **params)
        wall = time.perf_counter() - t0
        missed = sum(1 for o, r in zip(offs, res)
                     if int(o) not in r.offsets.tolist())
        ans = np.array([r.stats.n_answers for r in res], dtype=np.int64)
        in_decade = int(np.sum((ans >= 10 ** (d + 8)) & (ans < 10 ** (d + 9))))
        log(section=f"{name}_decade", decade=f"1e{d}",
            n_queries=len(offs), qps=round(len(offs) / wall, 2),
            mean_t_ms=round(wall * 1e3 / len(offs), 1),
            mean_t1_ms=round(float(np.mean(
                [r.stats.t_phase1_ms for r in res])), 1),
            mean_t2_ms=round(float(np.mean(
                [r.stats.t_phase2_ms for r in res])), 1),
            mean_candidates=int(np.mean(
                [r.stats.n_candidates for r in res])),
            mean_answers=round(float(ans.mean()), 1),
            median_answers=int(np.median(ans)),
            in_decade=in_decade,
            false_dismissals=missed)


rng = np.random.default_rng(7)
offs = np.sort(rng.integers(0, N - L, PER_DECADE))

log(section="engine", name="rsm_ed")
eng = QueryEngine(data, index=index, icfg=icfg, qcfg=qcfg)
eps_rsm = calibrate("rsm", offs, eng.data_dev)
replay(eng, "rsm_ed", offs, eps_rsm, {})

log(section="engine", name="cnsm_ed")
neng = NormQueryEngine(data, index=index, icfg=icfg, qcfg=qcfg,
                       device_data=eng.data_dev)
eps_cnsm = calibrate("cnsm", offs, eng.data_dev)
replay(neng, "cnsm_ed", offs, eps_cnsm, {"alpha": 1.2, "beta": 5.0})
log(section="done")
