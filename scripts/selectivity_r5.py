#!/usr/bin/env python
"""Reference-scale selectivity evaluation at n=1e8 (VERDICT r4 next #8).

The reference evaluates 100 queries per answer-selectivity decade
(QueryTestGroupBySelectivity.java:36-44, decades 1e-5..1e-9 at its scales).
At n=1e8 an answer set of one self-match is selectivity 1e-8, so the
reachable decades are 1e-8..1e-5; this driver fills each with 100 queries by
sweeping epsilon over random offsets, then replays each decade as a timed
batch and reports per-decade T/T1/T2/#candidates/#answers and false
dismissals (a query's own offset missing from its answers).

Engines: RSM-ED and cNSM-ED (alpha=1.2, beta=5.0), both through the device
serving route (stats-only index + fused Pallas flag probe).

Output: one JSON line per section; the final `table` lines feed
docs/results_r5.md.
"""
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

N = 100_000_000
L = 8192
PER_DECADE = 100
DECADES = (-8, -7, -6, -5)

icfg = IndexConfig()
qcfg = QueryConfig.tpu_tuned(dense_probe_min_count=0)

t0 = time.perf_counter()
data = generate_series(N, seed=20260817)
index = build_index_device_stats(data, icfg)
log(section="setup", sec=round(time.perf_counter() - t0, 1))


def decade_of(n_ans: int) -> int:
    if n_ans <= 0:
        return 0
    return int(np.floor(np.log10(n_ans / N)))


def fill_decades(eng, eps_grid, params, seed):
    """Sweep (offset, eps) pairs in batches until each decade holds
    PER_DECADE queries (or the sweep budget runs out)."""
    rng = np.random.default_rng(seed)
    bins = {d: [] for d in DECADES}
    budget = 24  # sweep batches of 32
    while budget > 0 and any(len(v) < PER_DECADE for v in bins.values()):
        budget -= 1
        offs = rng.integers(0, N - L, 32)
        eps = rng.choice(eps_grid, 32)
        queries = np.stack([data[o:o + L] for o in offs])
        t0 = time.perf_counter()
        res = eng.query_batch(queries, eps, **params)
        log(section="sweep_batch_s", s=round(time.perf_counter() - t0, 1))
        for o, e, r in zip(offs, eps, res):
            d = decade_of(r.stats.n_answers)
            if d in bins and len(bins[d]) < PER_DECADE:
                bins[d].append((int(o), float(e)))
        log(section="sweep", left={f"1e{d}": PER_DECADE - len(v)
                                   for d, v in bins.items()})
    return bins


def replay(eng, name, bins, params):
    for d in DECADES:
        entries = bins[d]
        if not entries:
            log(section=f"{name}_decade", decade=f"1e{d}", n_queries=0)
            continue
        offs = np.array([o for o, _ in entries])
        eps = np.array([e for _, e in entries])
        queries = np.stack([data[o:o + L] for o in offs])
        t0 = time.perf_counter()
        res = eng.query_batch(queries, eps, **params)
        wall = time.perf_counter() - t0
        missed = sum(1 for o, r in zip(offs, res)
                     if int(o) not in r.offsets.tolist())
        log(section=f"{name}_decade", decade=f"1e{d}",
            n_queries=len(entries), qps=round(len(entries) / wall, 2),
            mean_t_ms=round(wall * 1e3 / len(entries), 1),
            mean_t1_ms=round(float(np.mean(
                [r.stats.t_phase1_ms for r in res])), 1),
            mean_t2_ms=round(float(np.mean(
                [r.stats.t_phase2_ms for r in res])), 1),
            mean_candidates=int(np.mean(
                [r.stats.n_candidates for r in res])),
            mean_answers=round(float(np.mean(
                [r.stats.n_answers for r in res])), 1),
            false_dismissals=missed)


log(section="engine", name="rsm_ed")
eng = QueryEngine(data, index=index, icfg=icfg, qcfg=qcfg)
bins = fill_decades(eng, np.array([2.0, 4.0, 7.0, 10.0, 14.0, 20.0]), {}, 7)
replay(eng, "rsm_ed", bins, {})

log(section="engine", name="cnsm_ed")
neng = NormQueryEngine(data, index=index, icfg=icfg, qcfg=qcfg,
                       device_data=eng.data_dev)
nbins = fill_decades(neng, np.array([1.0, 2.0, 3.0, 4.0, 6.0, 8.0]),
                     {"alpha": 1.2, "beta": 5.0}, 8)
replay(neng, "cnsm_ed", nbins, {"alpha": 1.2, "beta": 5.0})
log(section="done")
