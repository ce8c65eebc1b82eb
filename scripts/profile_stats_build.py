#!/usr/bin/env python
"""Per-op wall profile of the stats-only device build at n=1e8 (VERDICT r4
next #3: 34.2 -> >=50 Mpts/s needs total <= 10 s for 5 scales).

Times, per scale and warm: the bucket program alone, the stats pipeline
alone, and inside-the-pipeline candidates (cummax/RLE vs sort vs
searchsorted) via standalone jitted twins at the same shape.
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

from kvmatch_tpu.config import IndexConfig
from kvmatch_tpu.data.generators import generate_series
from kvmatch_tpu.index import device_build as db


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    n = 100_000_000
    icfg = IndexConfig()
    data = generate_series(n, seed=20260817)
    data_dev = jnp.asarray(data, jnp.float32)
    data_dev.block_until_ready()

    # end-to-end warm build
    st: dict = {}
    db.build_index_device_stats(data, icfg, stats=st, data_dev=data_dev)
    st2: dict = {}
    db.build_index_device_stats(data, icfg, stats=st2, data_dev=data_dev)
    print(json.dumps({"build_cold": st, "build_warm": st2}), flush=True)

    scales = tuple(icfg.scales)
    u = min(scales)
    cap = icfg.maximum_diff - 1
    s = 10.0 ** (icfg.pos_of_d - 1)
    bucket_lo = int(2 * np.floor(float(data.min()) * s)) - 2
    bucket_hi = int(2 * np.floor(float(data.max()) * s)) + 3
    nbs = 1 << max(bucket_hi - bucket_lo + 2, 2).bit_length()

    per = {}
    for w in scales:
        tb, b = timeit(db._bucket_prog(w, u, icfg.pos_of_d), data_dev)
        tp, _ = timeit(lambda bb: db._pipeline_stats_jit()(
            bb, jnp.int32(bucket_lo), jnp.int32(n - w + 1), cap, nbs), b)
        per[w] = {"bucket_s": round(tb, 3), "stats_s": round(tp, 3)}
    print(json.dumps({"per_scale": per, "nbs": nbs}), flush=True)

    # sub-op twins at M = n - u + 1
    M = n - u + 1
    b = db._bucket_prog(scales[0], u, icfg.pos_of_d)(data_dev)

    @jax.jit
    def rle_start(b, n_valid):
        pos = jnp.arange(M, dtype=jnp.int32)
        valid = pos < n_valid
        change = jnp.concatenate([jnp.ones(1, bool), b[1:] != b[:-1]])
        run_start = jax.lax.cummax(jnp.where(change, pos, -1))
        return (change | ((pos - run_start) % cap == 0)) & valid

    @jax.jit
    def comp_sort(b, start, n_valid):
        pos = jnp.arange(M, dtype=jnp.int32)
        valid = pos < n_valid
        comp = jnp.where(valid,
                         jnp.clip(b - bucket_lo, 0, nbs - 1) * 2
                         + start.astype(jnp.int32), jnp.int32(2 * nbs))
        return jax.lax.sort(comp)

    @jax.jit
    def search(sc):
        edges = jnp.arange(2 * nbs + 1, dtype=jnp.int32)
        return jnp.searchsorted(sc, edges, side="left")

    nv = jnp.int32(n - scales[0] + 1)
    t_rle, start = timeit(rle_start, b, nv)
    t_sort, sc = timeit(comp_sort, b, start, nv)
    t_search, _ = timeit(search, sc)
    print(json.dumps({"rle_cummax_s": round(t_rle, 3),
                      "sort_s": round(t_sort, 3),
                      "search_s": round(t_search, 3)}), flush=True)

    # Alternative histogram strategies at the same (M, span) shape: the
    # compact bucket span (a few hundred values at n=1e8) makes a blocked
    # compare-reduce viable — no sort, no scatter.
    span = bucket_hi - bucket_lo + 2  # actual distinct keys (pre-pow2)
    K = 2 * span + 2

    @jax.jit
    def comp_key(b, start, n_valid):
        pos = jnp.arange(M, dtype=jnp.int32)
        valid = pos < n_valid
        return jnp.where(valid,
                         jnp.clip(b - bucket_lo, 0, nbs - 1) * 2
                         + start.astype(jnp.int32), jnp.int32(K - 1))

    @jax.jit
    def hist_compare(comp):
        # (M,) -> (rows, 128) blocked; count each key by equality-compare
        # against a broadcast iota, reducing over rows inside one fusion.
        rows = comp.reshape(-1, 128)
        kv = jnp.arange(K, dtype=jnp.int32)
        acc = jnp.zeros((K, 128), jnp.int32)

        def body(i, acc):
            blk = jax.lax.dynamic_slice(rows, (i * 8192, 0), (8192, 128))
            eq = (blk[None, :, :] == kv[:, None, None]).astype(jnp.int32)
            return acc + eq.sum(axis=1)

        nb = rows.shape[0] // 8192
        acc = jax.lax.fori_loop(0, nb, body, acc)
        return acc.sum(axis=1)

    @jax.jit
    def hist_scatter(comp):
        return jnp.zeros(K, jnp.int32).at[comp].add(1, mode="drop")

    comp = comp_key(b, start, nv)
    jax.block_until_ready(comp)
    if int(M) % (8192 * 128) == 0:
        t_cmp, h1 = timeit(hist_compare, comp)
    else:
        pad = (-int(M)) % (8192 * 128)
        compp = jnp.pad(comp, (0, pad), constant_values=K - 1)

        @jax.jit
        def hc(c):
            return hist_compare(c)

        t_cmp, h1 = timeit(hc, compp)
    t_scat, h2 = timeit(hist_scatter, comp)
    ok = bool(np.array_equal(np.asarray(h1)[:K - 1],
                             np.asarray(h2)[:K - 1]))
    print(json.dumps({"span_keys": int(K), "hist_compare_s": round(t_cmp, 3),
                      "hist_scatter_s": round(t_scat, 3),
                      "hist_agree": ok}), flush=True)


if __name__ == "__main__":
    main()
