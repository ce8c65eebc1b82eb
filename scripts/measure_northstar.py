#!/usr/bin/env python
"""Focused north-star measurements (one long-lived process, serialized).

Sections (one JSON line each, flushed):
  1. device build at n=1e8 (spill mode)
  2. cNSM-ED n=1e8 L=8192 flood, host phase 1 vs device fly probe
  3. RSM-ED n=1e8 batch
  4. query_batch_device n=1e6 (unrolled probe)
  5. kernel efficiency (uncontended)

Each section is failure-isolated: an exception logs a section-error line and
the process continues (the tunnel is flaky; partial artifacts beat none).

Run with PYTHONPATH=/root/.axon_site:/root/repo so the axon TPU registers.
"""
import gc
import json
import time
import traceback

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_kvmatch")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp

_ = np.asarray(jnp.ones(1024))  # warm the link


def log(**kw):
    print(json.dumps(kw), flush=True)


def section(fn):
    try:
        fn()
    except Exception:
        log(section="ERROR", where=fn.__name__,
            trace=traceback.format_exc(limit=6))


from kvmatch_tpu.config import IndexConfig, QueryConfig
from kvmatch_tpu.data.generators import generate_series
from kvmatch_tpu.engine.norm_ed import NormQueryEngine
from kvmatch_tpu.engine.rsm_ed import QueryEngine
from kvmatch_tpu.index.device_build import build_index_device

icfg = IndexConfig()
qcfg = QueryConfig.tpu_tuned()
L = 8192
n8 = 100_000_000
state: dict = {}


def s1_device_build():
    t0 = time.perf_counter()
    state["data8"] = generate_series(n8, seed=20260817)
    log(section="gen_1e8", sec=round(time.perf_counter() - t0, 1))
    bst = {}
    t0 = time.perf_counter()
    state["index8"] = build_index_device(state["data8"], icfg, stats=bst)
    log(section="device_build_1e8", sec=round(time.perf_counter() - t0, 1),
        mpts_per_s=round(bst.get("mpts_per_second", 0.0), 1),
        **{k: round(float(v), 2) for k, v in bst.items()
           if k != "mpts_per_second"})


def _ensure_1e8():
    """Host-build fallback so later sections survive a section-1 failure."""
    if "data8" not in state:
        state["data8"] = generate_series(n8, seed=20260817)
    if "index8" not in state:
        from kvmatch_tpu.index.build import build_index_tpu
        state["index8"] = build_index_tpu(state["data8"], icfg,
                                          backend="host")


def _run_cnsm(tag, eng, q8, offs8):
    # warm with the FULL batch: the probe programs are shape-keyed on the
    # group size Q, so a smaller warmup leaves the real program compiling
    # inside the timed region (~30 s remote compile / 8 queries looked like
    # a 4.9 s/query phase 1).  Engine-level repeats do not memoize, so the
    # identical-batch warmup is safe to time against.
    eng.query_batch(q8, 4.0, alpha=1.2, beta=5.0)
    t0 = time.perf_counter()
    r8 = eng.query_batch(q8, 4.0, alpha=1.2, beta=5.0)
    dt = time.perf_counter() - t0
    log(section=tag, qps=round(8 / dt, 3), sec=round(dt, 1),
        found=sum(1 for o, r in zip(offs8, r8)
                  if int(o) in r.offsets.tolist()),
        cands=int(np.mean([r.stats.n_candidates for r in r8])),
        p1_ms=round(float(np.mean([r.stats.t_phase1_ms for r in r8])), 1),
        p2_ms=round(float(np.mean([r.stats.t_phase2_ms for r in r8])), 1))


def s2_cnsm_flood():
    _ensure_1e8()
    data8, index8 = state["data8"], state["index8"]
    rng8 = np.random.default_rng(2)
    offs8 = rng8.integers(0, n8 - L, 8)
    q8 = np.stack([data8[o:o + L] for o in offs8])
    eng8 = NormQueryEngine(data8, index=index8, icfg=icfg, qcfg=qcfg)
    state["data_dev8"] = eng8.data_dev
    _run_cnsm("cnsm_ed_1e8_host_p1", eng8, q8, offs8)
    qcfg_fly = QueryConfig.tpu_tuned(dense_probe_min_count=2_000_000)
    eng8f = NormQueryEngine(data8, index=index8, icfg=icfg, qcfg=qcfg_fly,
                            device_data=eng8.data_dev)
    _run_cnsm("cnsm_ed_1e8_fly_p1", eng8f, q8, offs8)


def s3_rsm_batch():
    _ensure_1e8()
    data8, index8 = state["data8"], state["index8"]
    reng8 = QueryEngine(data8, index=index8, icfg=icfg, qcfg=qcfg,
                        device_data=state.get("data_dev8"))
    offs_r = np.random.default_rng(3).integers(0, n8 - L, 128)
    q_r = np.stack([data8[o:o + L] for o in offs_r])
    reng8.query_batch(q_r, 10.0)  # full-batch warm (programs shape-key on Q)
    t0 = time.perf_counter()
    rr = reng8.query_batch(q_r, 10.0)
    dt = time.perf_counter() - t0
    log(section="rsm_ed_1e8_batch", qps=round(128 / dt, 2),
        found=sum(1 for o, r in zip(offs_r, rr)
                  if int(o) in r.offsets.tolist()))


def s4_device_batch():
    for k in ("data8", "index8", "data_dev8"):
        state.pop(k, None)
    gc.collect()
    from kvmatch_tpu.index.build import build_index_tpu

    n = 1_000_000
    data = generate_series(n, seed=20260816)
    index = build_index_tpu(data, icfg, backend="host")
    engine = QueryEngine(data, index=index, icfg=icfg, qcfg=qcfg)
    state["engine1e6"] = engine
    rng = np.random.default_rng(1)
    offs = rng.integers(0, n - L, 128)
    queries = np.stack([data[o:o + L] for o in offs])
    t0 = time.perf_counter()
    engine.query_batch_device(queries, 10.0, top_k=32768)  # compile+warm
    log(section="dev_batch_warmup", sec=round(time.perf_counter() - t0, 1))
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        dres = engine.query_batch_device(queries, 10.0, top_k=32768)
        best = max(best, 128 / (time.perf_counter() - t0))
    log(section="rsm_ed_device_batch", qps=round(best, 1),
        found=sum(1 for o, r in zip(offs, dres)
                  if int(o) in r.offsets.tolist()))

    neng = NormQueryEngine(data, index=index, icfg=icfg, qcfg=qcfg,
                           device_data=engine.data_dev)
    t0 = time.perf_counter()
    neng.query_batch_device(queries, 4.0, top_k=32768, alpha=1.2, beta=5.0)
    log(section="cnsm_dev_batch_warmup", sec=round(time.perf_counter() - t0, 1))
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        nres = neng.query_batch_device(queries, 4.0, top_k=32768,
                                       alpha=1.2, beta=5.0)
        best = max(best, 128 / (time.perf_counter() - t0))
    log(section="cnsm_ed_device_batch", qps=round(best, 1),
        found=sum(1 for o, r in zip(offs, nres)
                  if int(o) in r.offsets.tolist()))


def s5_kernel_eff():
    from kvmatch_tpu.utils.kernel_bench import measure_kernel_efficiency

    eng = state.get("engine1e6")
    if eng is None:
        from kvmatch_tpu.index.build import build_index_tpu
        data = generate_series(1_000_000, seed=20260816)
        index = build_index_tpu(data, icfg, backend="host")
        eng = QueryEngine(data, index=index, icfg=icfg, qcfg=qcfg)
    ke = measure_kernel_efficiency(eng.data_dev, reps=8)
    log(section="kernel_efficiency",
        **{k: (round(v, 2) if isinstance(v, float) else v)
           for k, v in ke.items()})


section(s1_device_build)
section(s2_cnsm_flood)
section(s3_rsm_batch)
section(s4_device_batch)
section(s5_kernel_eff)
log(section="done")
