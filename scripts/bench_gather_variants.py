#!/usr/bin/env python
"""Measure window-gather variants on the TPU (VERDICT r2 item 1).

The round-2 gather (vmap(dynamic_slice) over the flat series) achieved
0.93 GB/s vs the chip's measured >=47 GB/s contiguous read.  Candidate fixes:

  base     : round-2 vmap(dynamic_slice) on the 1-D series
  sorted   : same, offsets pre-sorted ascending (locality hint)
  barrel-C : tile-aligned two-stage — reshape series to (n/C, C), dense ROW
             gather of the T=L/C+1 tiles covering each window, then realign
             by rem=offset%C with a log2(C)-stage conditional barrel shifter
             (pure dense ops XLA can fuse)
  rowslice : row gather then per-row dynamic_slice realign on the (B, T*C)
             block (gather #2 is on a small minor axis)

Each is timed with reps folded inside one jitted scan (dispatch amortized,
same protocol as utils/kernel_bench).  Reports achieved GB/s of mandatory
traffic (B*L*4 window bytes).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_kvmatch")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp  # noqa: E402


def timed_scan(fn, reps=8):
    @jax.jit
    def run():
        def body(carry, i):
            return carry + fn(i), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
        return acc

    r = run()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    jax.block_until_ready(run())
    return (time.perf_counter() - t0) / reps


def gather_base(data, offs, L):
    return jax.vmap(lambda o: jax.lax.dynamic_slice(data, (o,), (L,)))(offs)


def gather_barrel(data_tiles, offs, L, C):
    ntiles = data_tiles.shape[0]
    T = (L + C - 1) // C + 1
    base = offs // C
    rows = jnp.minimum(base[:, None] + jnp.arange(T)[None, :], ntiles - 1)
    flat = data_tiles[rows].reshape(offs.shape[0], T * C)
    rem = (offs % C).astype(jnp.int32)
    shift = 1
    while shift < C:
        bit = (rem & shift) != 0
        rolled = jnp.concatenate([flat[:, shift:], flat[:, :shift]], axis=1)
        flat = jnp.where(bit[:, None], rolled, flat)
        shift *= 2
    return flat[:, :L]


def gather_rowslice(data_tiles, offs, L, C):
    ntiles = data_tiles.shape[0]
    T = (L + C - 1) // C + 1
    base = offs // C
    rows = jnp.minimum(base[:, None] + jnp.arange(T)[None, :], ntiles - 1)
    flat = data_tiles[rows].reshape(offs.shape[0], T * C)
    rem = (offs % C).astype(jnp.int32)
    return jax.vmap(lambda f, r: jax.lax.dynamic_slice(f, (r,), (L,)))(flat, rem)


def consume(w, q):
    d = w - q[None, :]
    return jnp.sum(d * d)


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    n = 1 << 25  # 32M f32 = 128 MB
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal(n), jnp.float32)
    jax.block_until_ready(data)

    for B, L in ((65536, 1024),):
        offs_np = rng.integers(0, n - L - 16, B)
        offs = jnp.asarray(offs_np, jnp.int32)
        offs_sorted = jnp.asarray(np.sort(offs_np), jnp.int32)
        q = data[:L]
        mand = B * L * 4

        def run(name, fn):
            sec = timed_scan(fn)
            print(f"  {name:14s} {sec*1e3:9.2f} ms   {mand/sec/1e9:8.2f} GB/s", flush=True)

        print(f"B={B} L={L}  mandatory={mand/1e6:.0f} MB")
        run("base", lambda i: consume(gather_base(data, offs + i, L), q))
        run("sorted", lambda i: consume(gather_base(data, offs_sorted + i, L), q))
        for C in (256,):
            tiles = data.reshape(n // C, C)
            run(f"barrel-{C}", lambda i, t=tiles, C=C: consume(
                gather_barrel(t, offs + i, L, C), q))
        for C in (256,):
            tiles = data.reshape(n // C, C)
            run(f"rowslice-{C}", lambda i, t=tiles, C=C: consume(
                gather_rowslice(t, offs + i, L, C), q))

        # correctness spot check
        w0 = np.asarray(gather_base(data, offs[:64], L))
        for C in (256,):
            tiles = data.reshape(n // C, C)
            wb = np.asarray(gather_barrel(tiles, offs[:64], L, C))
            assert np.array_equal(w0, wb), f"barrel-{C} mismatch"
        tiles = data.reshape(n // 256, 256)
        wr = np.asarray(gather_rowslice(tiles, offs[:64], L, 256))
        assert np.array_equal(w0, wr), "rowslice mismatch"
        print("  correctness: all variants bit-identical")


if __name__ == "__main__":
    main()
