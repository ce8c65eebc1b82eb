#!/usr/bin/env python
"""Micro-benchmark: window-gather formulations + MXU sliding-dot on real TPU.

Round-3 evidence for the phase-2 kernel redesign (VERDICT r2 item 1: the
vmap(dynamic_slice) gather achieves 0.93 GB/s vs >=47 GB/s contiguous reads).
Candidates measured, all computing the same ED reduction so outputs are
comparable and XLA cannot DCE:

  g_dynslice   : vmap(lax.dynamic_slice)(data, offs)  -- round-2 baseline
  g_elemwise   : data[offs[:,None] + arange(L)]       -- elementwise 2D gather
  g_rowtake    : aligned two-block row gather (data as (n/C, C) tiles,
                 jnp.take rows o//C .. o//C+K) + in-row vmap(dynamic_slice)
  d_toeplitz   : NO materialization -- sliding dots at C consecutive aligned
                 offsets via one (B, M) @ (M, C) MXU matmul; d2 from local
                 sliding sums; per-candidate shift selected by one-hot.
  corr_fft     : region sliding-dot via rfft/irfft   -- round-2 region path
  corr_matmul  : region sliding-dot via Toeplitz matmul on MXU

Also reports raw f32 matmul throughput at the Toeplitz shapes for the
roofline, at default and HIGHEST precision.
"""
import time

import numpy as np


def timed(fn, reps=8):
    import jax
    import jax.numpy as jnp

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


def main():
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_kvmatch")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    print("device:", jax.devices()[0])
    n = 1 << 24
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal(n), jnp.float32)
    jax.block_until_ready(data)

    B, L = 65536, 1024
    C = 128
    K = L // C
    offs_np = rng.integers(0, n - L - 64, B).astype(np.int32)
    offs = jnp.asarray(offs_np)
    q = data[:L]
    mand = B * L * 4  # mandatory bytes (windows read once)

    def report(name, sec, bytes_=mand, flops=None):
        line = f"{name:14s} {sec*1e3:9.2f} ms   {bytes_/sec/1e9:8.2f} GB/s(mand)"
        if flops:
            line += f"   {flops/sec/1e12:6.2f} TF/s"
        print(line)

    # -- 1. vmap dynamic_slice (round-2 baseline) --
    def g_dynslice(i):
        x = jax.vmap(lambda o: jax.lax.dynamic_slice(data, (o,), (L,)))(offs + i)
        d = x - q[None, :]
        return jnp.sum(d * d)
    report("g_dynslice", timed(g_dynslice))

    # -- 2. elementwise 2D gather --
    def g_elemwise(i):
        x = data[(offs + i)[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]]
        d = x - q[None, :]
        return jnp.sum(d * d)
    report("g_elemwise", timed(g_elemwise))

    # -- 3. aligned row gather + in-row dynamic slice --
    rows2d = data.reshape(n // C, C)

    def g_rowtake(i):
        o = offs + i
        r0 = o // C
        s = o % C
        ridx = r0[:, None] + jnp.arange(K + 1, dtype=jnp.int32)[None, :]
        buf = jnp.take(rows2d, ridx, axis=0).reshape(B, (K + 1) * C)
        x = jax.vmap(lambda b, st: jax.lax.dynamic_slice(b, (st,), (L,)))(buf, s)
        d = x - q[None, :]
        return jnp.sum(d * d)
    report("g_rowtake", timed(g_rowtake))

    # -- 3b. row gather only (no in-row extraction) --
    def g_rowonly(i):
        o = offs + i
        r0 = o // C
        ridx = r0[:, None] + jnp.arange(K + 1, dtype=jnp.int32)[None, :]
        buf = jnp.take(rows2d, ridx, axis=0)
        return jnp.sum(buf[:, 0, 0]) + jnp.sum(buf[:, K, C - 1])
    report("g_rowonly", timed(g_rowonly), bytes_=B * (K + 1) * C * 4)

    # -- 4. Toeplitz sliding-dot, no materialization --
    M = L + C
    # T[m, s] = q[m - s] for 0 <= m-s < L
    m_idx = np.arange(M)[:, None]
    s_idx = np.arange(C)[None, :]
    qn = np.asarray(q)
    Tm = np.where((m_idx - s_idx >= 0) & (m_idx - s_idx < L),
                  qn[np.clip(m_idx - s_idx, 0, L - 1)], 0.0).astype(np.float32)
    Tm = jnp.asarray(Tm)
    q2 = jnp.sum(q * q)

    def sliding_s2(buf):
        # local sliding sum of squares over the (B, M) buffer, width L ->
        # (B, C) via cumsum difference (f32, local accumulation over M=1152)
        c = jnp.cumsum(buf * buf, axis=1)
        zero = jnp.zeros((buf.shape[0], 1), jnp.float32)
        cz = jnp.concatenate([zero, c], axis=1)
        return cz[:, L:M + 1] - cz[:, 0:C]  # wait: want s2 at shifts 0..C-1

    def d_toeplitz(i, prec):
        o = offs + i
        r0 = o // C
        s = o % C
        ridx = r0[:, None] + jnp.arange(K + 1, dtype=jnp.int32)[None, :]
        buf = jnp.take(rows2d, ridx, axis=0).reshape(B, M)
        dots = jnp.dot(buf, Tm, precision=prec)       # (B, C)
        onehot = (s[:, None] == jnp.arange(C, dtype=jnp.int32)[None, :])
        c = jnp.cumsum(buf * buf, axis=1)
        cz = jnp.concatenate([jnp.zeros((B, 1), jnp.float32), c], axis=1)
        s2 = cz[:, L:L + C] - cz[:, 0:C]              # (B, C) shift-local sums
        d2 = s2 - 2.0 * dots + q2
        return jnp.sum(jnp.where(onehot, d2, 0.0))
    fl = 2 * B * M * C
    report("d_toep_def", timed(lambda i: d_toeplitz(i, jax.lax.Precision.DEFAULT)),
           flops=fl)
    report("d_toep_high", timed(lambda i: d_toeplitz(i, jax.lax.Precision.HIGHEST)),
           flops=fl)

    # accuracy check vs f64
    x64 = np.asarray(data, np.float64)
    o0 = offs_np[:256]
    d2_ref = np.array([np.sum((x64[o:o + L] - np.asarray(q, np.float64)) ** 2)
                       for o in o0])

    def d2_toep(prec):
        o = jnp.asarray(o0)
        r0 = o // C
        s = o % C
        ridx = r0[:, None] + jnp.arange(K + 1, dtype=jnp.int32)[None, :]
        buf = jnp.take(rows2d, ridx, axis=0).reshape(o0.size, M)
        dots = jnp.dot(buf, Tm, precision=prec)
        onehot = (s[:, None] == jnp.arange(C, dtype=jnp.int32)[None, :])
        c = jnp.cumsum(buf * buf, axis=1)
        cz = jnp.concatenate([jnp.zeros((o0.size, 1), jnp.float32), c], axis=1)
        s2 = cz[:, L:L + C] - cz[:, 0:C]
        d2 = s2 - 2.0 * dots + q2
        return np.asarray(jnp.sum(jnp.where(onehot, d2, 0.0), axis=1))
    for prec, nm in ((jax.lax.Precision.DEFAULT, "default"),
                     (jax.lax.Precision.HIGHEST, "highest")):
        err = np.abs(d2_toep(prec) - d2_ref)
        rel = err / np.maximum(d2_ref, 1e-9)
        print(f"  d2 err ({nm}): max abs {err.max():.3e}  max rel {rel.max():.3e}"
              f"  (d2 scale ~{d2_ref.mean():.0f})")

    # -- 5. region correlate: FFT vs matmul --
    R, Mreg = 8192, 512
    r_len = Mreg + L - 1
    starts = jnp.asarray(rng.integers(0, n - r_len - 64, R), jnp.int32)

    def corr_fft(i):
        x = jax.vmap(lambda s_: jax.lax.dynamic_slice(data, (s_,), (r_len,)))(starts + i)
        N = 1 << int(np.ceil(np.log2(r_len)))
        X = jnp.fft.rfft(x, N)
        Qf = jnp.fft.rfft(q[::-1], N)
        full = jnp.fft.irfft(X * Qf[None, :], N)
        return jnp.sum(full[:, L - 1:r_len])
    report("corr_fft", timed(corr_fft), bytes_=R * r_len * 4)

    # Toeplitz for region: (R, r_len) @ (r_len, Mreg)
    m2 = np.arange(r_len)[:, None]
    s2i = np.arange(Mreg)[None, :]
    T2 = np.where((m2 - s2i >= 0) & (m2 - s2i < L),
                  qn[np.clip(m2 - s2i, 0, L - 1)], 0.0).astype(np.float32)
    T2 = jnp.asarray(T2)

    def corr_mm(i, prec):
        x = jax.vmap(lambda s_: jax.lax.dynamic_slice(data, (s_,), (r_len,)))(starts + i)
        return jnp.sum(jnp.dot(x, T2, precision=prec))
    fl2 = 2 * R * r_len * Mreg
    report("corr_mm_def", timed(lambda i: corr_mm(i, jax.lax.Precision.DEFAULT)),
           bytes_=R * r_len * 4, flops=fl2)
    report("corr_mm_high", timed(lambda i: corr_mm(i, jax.lax.Precision.HIGHEST)),
           bytes_=R * r_len * 4, flops=fl2)

    # correlate accuracy (matmul vs f64)
    st0 = np.asarray(starts)[:64]
    corr_ref = np.stack([np.correlate(x64[s:s + r_len], np.asarray(q, np.float64),
                                      mode="valid") for s in st0])
    for prec, nm in ((jax.lax.Precision.DEFAULT, "default"),
                     (jax.lax.Precision.HIGHEST, "highest")):
        x = jax.vmap(lambda s_: jax.lax.dynamic_slice(data, (s_,), (r_len,)))(jnp.asarray(st0))
        cm = np.asarray(jnp.dot(x, T2, precision=prec), np.float64)
        err = np.abs(cm - corr_ref).max()
        scale = np.sqrt((corr_ref ** 2).mean())
        print(f"  corr err ({nm}): max abs {err:.3e}  (||corr|| rms {scale:.1f}, "
              f"L={L})")

    # -- 6. raw matmul roofline at these shapes --
    A1 = jnp.asarray(rng.standard_normal((4096, 1152)), jnp.float32)
    B1 = jnp.asarray(rng.standard_normal((1152, 1024)), jnp.float32)
    for prec, nm in ((jax.lax.Precision.DEFAULT, "mm_default"),
                     (jax.lax.Precision.HIGHEST, "mm_highest")):
        def mm(i):
            return jnp.sum(jnp.dot(A1 + i * 0.0, B1, precision=prec))
        fl3 = 2 * 4096 * 1152 * 1024
        report(nm, timed(mm), bytes_=(4096 * 1152 + 1152 * 1024) * 4, flops=fl3)


if __name__ == "__main__":
    main()
