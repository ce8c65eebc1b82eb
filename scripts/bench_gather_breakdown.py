#!/usr/bin/env python
"""Breakdown: row-gather vs realign cost for the tiled window gather."""
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

    jax.block_until_ready(run())
    t0 = time.perf_counter()
    jax.block_until_ready(run())
    return (time.perf_counter() - t0) / reps


def rowgather(tiles, offs, L, C):
    ntiles = tiles.shape[0]
    T = (L + C - 1) // C + 1
    rows = jnp.minimum((offs // C)[:, None] + jnp.arange(T)[None, :], ntiles - 1)
    return tiles[rows].reshape(offs.shape[0], T * C)


def barrel(flat, rem, C, L):
    shift = 1
    while shift < C:
        bit = (rem & shift) != 0
        rolled = jnp.concatenate([flat[:, shift:], flat[:, :shift]], axis=1)
        flat = jnp.where(bit[:, None], rolled, flat)
        shift *= 2
    return flat[:, :L]


def main():
    n = 1 << 25
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal(n), jnp.float32)
    jax.block_until_ready(data)
    B, L = 65536, 1024
    offs_np = rng.integers(0, n - L - 16, B)
    offs = jnp.asarray(offs_np, jnp.int32)
    q = data[:L]
    mand = B * L * 4

    def run(name, fn):
        sec = timed_scan(fn)
        print(f"  {name:22s} {sec*1e3:9.2f} ms   {mand/sec/1e9:8.2f} GB/s",
              flush=True)

    def consume(w):
        d = w - q[None, :]
        return jnp.sum(d * d)

    print(f"B={B} L={L}")
    for C in (128, 256, 512, 1024):
        tiles = data.reshape(n // C, C)
        run(f"rowgather-only C={C}", lambda i, t=tiles, C=C: jnp.sum(
            rowgather(t, offs + i, L, C)[:, ::97]))
    for C in (128, 256):
        tiles = data.reshape(n // C, C)
        run(f"rowgather+barrel C={C}", lambda i, t=tiles, C=C: consume(
            barrel(rowgather(t, offs + i, L, C), (offs + i) % C, C, L)))
    # barrel alone on resident block (upper bound for realign cost)
    C = 256
    T = (L + C - 1) // C + 1
    flat0 = jnp.asarray(rng.standard_normal((B, T * C)), jnp.float32)
    rem0 = jnp.asarray(offs_np % C, jnp.int32)
    run("barrel-only C=256", lambda i: consume(barrel(flat0, rem0 + 0 * i, C, L)))
    # take_along_axis realign
    run("rowgather+take C=256", lambda i: consume(
        jnp.take_along_axis(rowgather(data.reshape(n // 256, 256), offs + i, L, 256),
                            ((offs + i) % 256)[:, None] + jnp.arange(L)[None, :],
                            axis=1)))


if __name__ == "__main__":
    main()
