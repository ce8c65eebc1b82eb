#!/usr/bin/env python
"""Probe-pass wall time at the north-star shape (n=1e8, Q=8, L=8192, S=30).

VERDICT r4 missing #2 / next #2: the XLA flags probe costs 8.6 s/pass here;
the fused Pallas kernel's bar is <= 0.3 s.  Synthetic 30-segment plans (the
kernel's cost is shape-, not value-, dependent).
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_kvmatch")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
_ = np.asarray(jnp.ones(1024))

from kvmatch_tpu.config import IndexConfig
from kvmatch_tpu.data.generators import generate_series
from kvmatch_tpu.parallel.query import (FLY_FILL, fly_pad_for,
                                        make_dense_probe_step_flags,
                                        make_dense_probe_step_flags_pallas,
                                        pack_segments_batch)
from kvmatch_tpu.plan import QuerySegment

icfg = IndexConfig()
n = 100_000_000
L, Q = 8192, 8
t0 = time.time()
data = generate_series(n, seed=20260817)
print(json.dumps({"gen_s": round(time.time() - t0, 1)}), flush=True)
w_max = max(icfg.scales)
pad = fly_pad_for(L, w_max)
data_p = jnp.concatenate([jnp.asarray(data, jnp.float32),
                          jnp.full(pad, FLY_FILL, jnp.float32)])
rng = np.random.default_rng(2)
offs = rng.integers(0, n - L, Q)
seg_lists = []
for o in offs:
    q = data[o:o + L]
    segs, pos = [], 0
    widths = [400, 200, 100, 50, 25] * 6  # 30 segments
    for w in widths:
        if (pos + 1) * 25 + w > L:
            break
        mean = q[pos * 25: pos * 25 + w].mean()
        segs.append(QuerySegment(order=pos + 1, w=w, mean_lo=mean,
                                 mean_hi=mean, count=100))
        pos += w // 25
    seg_lists.append(segs)
print(json.dumps({"segments": [len(s) for s in seg_lists]}), flush=True)
segs = pack_segments_batch(seg_lists, tuple(icfg.scales))
eps2 = jnp.full(Q, 16.0, jnp.float32)
cons = jnp.asarray([[1.2, 5.0, data[o:o+L].mean(), data[o:o+L].std()]
                    for o in offs], jnp.float32)

out = {}
pal = make_dense_probe_step_flags_pallas(icfg, L, norm=True)
t0 = time.time()
r = pal(data_p, segs, eps2, cons, jnp.int32(n))
jax.block_until_ready(r)
out["pallas_compile_run_s"] = round(time.time() - t0, 2)
times = []
for _ in range(3):
    t0 = time.time()
    r = pal(data_p, segs, eps2, cons, jnp.int32(n))
    jax.block_until_ready(r)
    times.append(time.time() - t0)
out["pallas_pass_s"] = [round(t, 3) for t in times]
out["pallas_counts"] = np.asarray(r[0]).tolist()
print(json.dumps(out), flush=True)

# Engine-style serving route: cached constraint stats + cached bucket stack
# (what _device_dense_phase1_flags runs after the first batch).
from kvmatch_tpu.parallel.query import (make_bucket_stack_prog,
                                        make_cons_stats_prog)
out2 = {}
t0 = time.time()
stats3 = make_cons_stats_prog(L)(data_p)
jax.block_until_ready(stats3)
out2["cons_stats_build_s"] = round(time.time() - t0, 2)
t0 = time.time()
bstack3 = make_bucket_stack_prog(icfg)(data_p)
jax.block_until_ready(bstack3)
out2["bucket_stack_build_s"] = round(time.time() - t0, 2)
pal_c = make_dense_probe_step_flags_pallas(icfg, L, norm=True,
                                           cached_stats=True,
                                           cached_buckets=True)
t0 = time.time()
r2 = pal_c(data_p, segs, eps2, cons, jnp.int32(n), stats3=stats3,
           bstack3=bstack3)
jax.block_until_ready(r2)
out2["cached_compile_run_s"] = round(time.time() - t0, 2)
times = []
for _ in range(3):
    t0 = time.time()
    r2 = pal_c(data_p, segs, eps2, cons, jnp.int32(n), stats3=stats3,
               bstack3=bstack3)
    jax.block_until_ready(r2)
    times.append(time.time() - t0)
out2["cached_pass_s"] = [round(t, 3) for t in times]
out2["cached_counts_equal"] = bool(
    np.array_equal(np.asarray(r[0]), np.asarray(r2[0])))
print(json.dumps(out2), flush=True)

if "--xla" in sys.argv:
    xla = make_dense_probe_step_flags(icfg, L, flag_block=256, norm=True)
    t0 = time.time()
    r = xla(data_p, segs, eps2, cons, jnp.int32(n))
    jax.block_until_ready(r)
    print(json.dumps({"xla_compile_run_s": round(time.time() - t0, 2)}),
          flush=True)
    t0 = time.time()
    r = xla(data_p, segs, eps2, cons, jnp.int32(n))
    jax.block_until_ready(r)
    print(json.dumps({"xla_pass_s": round(time.time() - t0, 3),
                      "xla_counts": np.asarray(r[0]).tolist()}), flush=True)
