#!/usr/bin/env python
"""Op-level profile of the device index build at M=1e8 (VERDICT r4 next #3).

Times the primitive classes the build pipelines are made of (cumsum, cummax,
scatter-set/add, gather, elementwise) plus each real pipeline stage per
scale, so the 94 s device wall can be attributed and attacked.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_kvmatch")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
_ = np.asarray(jnp.ones(16))


def log(**kw):
    print(json.dumps(kw), flush=True)


def timeit(name, fn, *args, reps=3):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(*args)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    log(op=name, ms=round(best * 1e3, 1))
    return best


M = 100_000_000
NB = 1 << 20
rng = np.random.default_rng(0)

from kvmatch_tpu.data.generators import generate_series
data = generate_series(M, seed=1)
data_dev = jnp.asarray(data, jnp.float32)

from kvmatch_tpu.index.device_build import _bucket_prog, _pipeline_a_jit, _pipeline_b_jit
from kvmatch_tpu.config import IndexConfig
icfg = IndexConfig()

# raw bucket ids for w=25
b = _bucket_prog(25, 25, icfg.pos_of_d)(data_dev)
jax.block_until_ready(b)
log(op="bucket_prog_w25_compiled", note="timing below")
timeit("bucket_prog_w25", lambda d: _bucket_prog(25, 25, icfg.pos_of_d)(d), data_dev)

pos = jnp.arange(M, dtype=jnp.int32)
x32 = jnp.asarray(rng.integers(0, 1 << 20, M), jnp.int32)

timeit("elementwise_3op", lambda v: (v * 2 + 1) ^ 3, x32)
timeit("cumsum_i32", lambda v: jnp.cumsum(v), x32)
timeit("cummax_i32", lambda v: jax.lax.cummax(v), x32)
timeit("gather_M_from_NB", lambda v: jnp.zeros(NB, jnp.int32).at[0].set(1)[jnp.clip(v, 0, NB - 1)], x32)
timeit("scatter_add_M_to_NB", lambda v: jnp.zeros(NB + 1, jnp.int32).at[jnp.clip(v, 0, NB - 1)].add(1, mode="drop"), x32)
# monotone destination compaction scatter (the RLE pattern): dest is sorted
start = np.zeros(M, bool); start[:: 37] = True
dest = np.where(start, np.cumsum(start) - 1, M).astype(np.int32)
dest_dev = jnp.asarray(dest)
timeit("scatter_set_M_to_M_sorted", lambda d, v: jnp.zeros(M + 1, jnp.int32).at[d].set(v, mode="drop")[:M], dest_dev, x32)

# full stage A for w=25
bucket_lo = int(2 * np.floor(float(data.min()) * 10)) - 2
cap = icfg.maximum_diff - 1
pa = _pipeline_a_jit()
a = pa(b, jnp.int32(bucket_lo), jnp.int32(M), cap)
jax.block_until_ready(a)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    a = pa(b, jnp.int32(bucket_lo), jnp.int32(M), cap)
    jax.block_until_ready(a)
    best = min(best, time.perf_counter() - t0)
log(op="stage_a_w25", ms=round(best * 1e3, 1), n_iv=int(a[0]), n_rows=int(a[1]))

# host merge + stage B
from kvmatch_tpu.index.device_build import _merge_scan, GMAX, DMAX
n_rows = int(a[1])
counts = np.asarray(a[3][:n_rows]).astype(np.int64)
row_offs = np.asarray(a[4][:n_rows]).astype(np.int64)
joins = np.asarray(a[5]).reshape(GMAX, DMAX)[:n_rows]
t0 = time.perf_counter()
grp, ng = _merge_scan(counts, row_offs, joins, icfg.merge_count_factor,
                      icfg.merge_shrink_factor, cap)
log(op="host_merge_scan_w25", ms=round((time.perf_counter() - t0) * 1e3, 1),
    rows=n_rows, groups=ng)
pad = np.zeros(GMAX, np.int32); pad[:n_rows] = grp
pb = _pipeline_b_jit()
ob = pb(a[6], a[7], a[8], a[0], jnp.asarray(pad), cap)
jax.block_until_ready(ob)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    ob = pb(a[6], a[7], a[8], a[0], jnp.asarray(pad), cap)
    jax.block_until_ready(ob)
    best = min(best, time.perf_counter() - t0)
log(op="stage_b_w25", ms=round(best * 1e3, 1), pieces=int(ob[0]))
log(op="done")
