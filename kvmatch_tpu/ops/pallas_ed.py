"""Pallas TPU kernel for the phase-2 hot loop: candidate-window distance batches.

The XLA fallback (ops/ed.py) materializes a (B, K) covering-tile gather and a
shifted-query row gather before reducing — three full HBM round-trips for data
that is consumed once.  This kernel streams each candidate window HBM->VMEM
with explicit async DMAs and reduces in VMEM without ever writing a gathered
matrix back to HBM.

Two constraints shaped the design:

* **Mosaic requires 1-D HBM DMA starts to be tile-aligned** (1024 f32
  elements) — candidate offsets are arbitrary, so each DMA copies the ALIGNED
  superset window ``data[align_down(off) : align_down(off) + L + 1024]`` (the
  start is asserted aligned via ``pl.multiple_of``), and the kernel realigns
  in VMEM with a log2(1024)-stage conditional barrel shifter of static rolls
  keyed on ``rem = off - align_down(off)`` — the same static-addressing trick
  as ops/ed.py's tiled gather and the probe's _row_at_shift.

* **DMA latency must overlap compute**: the round-3 version started and
  waited a block's DMAs inside the same grid step, so copies and compute
  strictly alternated and the kernel ran at DMA latency, not bandwidth.  This
  version runs the standard double-buffered pipeline —

    step g:  start BLOCK DMAs for step g+1 into slot (g+1)%2
             wait the BLOCK DMAs for step g   in slot g%2      (issued at g-1)
             realign (barrel) + reduce step g's candidates      (VPU)

  so up to 2*BLOCK copies are in flight while the VPU reduces.

Aligned starts arrive via scalar prefetch (pltpu.PrefetchScalarGridSpec) so
the DMA addresses are known before the body runs; remainders ride a VMEM
input.  The raw-ED and z-normalized variants share the layout; both are
exercised against the XLA kernels in tests/test_pallas_kernels.py (interpret
mode on CPU, compiled on TPU).

Reference scalar loops this replaces: QueryEngine.java:343-363,
NormQueryEngine.java:484-527.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: HBM DMA start alignment quantum for f32 1-D slices (Mosaic requirement).
ALIGN = 1024


def _block_for(length: int) -> int:
    """Candidates per grid step: ~1 MB of window scratch per slot, at least 8
    (f32 sublane count), at most 128 (semaphore array width)."""
    return int(min(128, max(8, (1 << 20) // ((length + ALIGN) * 4))))


def _ed_kernel(length: int, znorm: bool, block: int):
    W = length + ALIGN

    def kernel(offs_ref, rem_ref, data_ref, q_ref, out_ref, scratch, sems):
        g = pl.program_id(0)
        nsteps = pl.num_programs(0)

        def dma(slot, step, t):
            a = offs_ref[step * block + t]      # pre-aligned by the wrapper
            return pltpu.make_async_copy(
                data_ref.at[pl.ds(pl.multiple_of(a, ALIGN), W)],
                scratch.at[slot, t], sems.at[slot, t])

        @pl.when(g == 0)
        def _prologue():
            for t in range(block):
                dma(0, 0, t).start()

        @pl.when(g + 1 < nsteps)
        def _prefetch_next():
            nxt = (g + 1) % 2
            for t in range(block):
                dma(nxt, g + 1, t).start()

        cur = g % 2
        for t in range(block):
            dma(cur, g, t).wait()

        x = scratch[cur]                     # (block, W)
        # Realign each row by its remainder: conditional barrel shifter of
        # STATIC rolls (rem <= ALIGN, so row values [rem, rem+L) land in
        # [0, L) and the wrapped tail stays past column L).
        rem = rem_ref[:, 0]                  # (block,) i32 in [0, ALIGN]
        bit = 1
        while bit <= ALIGN:
            rolled = jnp.roll(x, -bit, axis=1)
            x = jnp.where((rem & bit)[:, None] != 0, rolled, x)
            bit <<= 1
        x = x[:, :length]                    # (block, L)
        q = q_ref[:]                         # (1, L)
        if znorm:
            inv_l = np.float32(1.0 / length)
            mean = jnp.sum(x, axis=1, keepdims=True) * inv_l
            centered = x - mean
            var = jnp.sum(centered * centered, axis=1, keepdims=True) * inv_l
            std = jnp.sqrt(var)
            safe = jnp.where(std > 0, std, 1.0)
            zdiff = centered / safe - q
            d2 = jnp.sum(zdiff * zdiff, axis=1, keepdims=True)
            d2 = jnp.where(std > 0, d2, jnp.float32(np.inf))
            out_ref[:, 0:1] = d2
            out_ref[:, 1:2] = mean
            out_ref[:, 2:3] = std
        else:
            diff = x - q
            out_ref[:, 0:1] = jnp.sum(diff * diff, axis=1, keepdims=True)

    return kernel


@functools.partial(jax.jit, static_argnames=("length", "znorm", "interpret"))
def window_distances_pallas(data: jnp.ndarray, query: jnp.ndarray,
                            offsets: jnp.ndarray, length: int,
                            znorm: bool = False, interpret: bool = False):
    """d2 (and mean/std when znorm) for B candidate windows.

    B must be a multiple of the internal block (pad with repeats of a valid
    offset — see block_multiple()).  ``data`` must be padded to an ALIGN
    multiple with at least ALIGN slack past the last window (pad once outside
    any timed loop; ops/ed.pad_to_tiles-style).  ``query`` must already be
    z-normalized when znorm=True.
    """
    B = offsets.shape[0]
    n = data.shape[0]
    W = length + ALIGN
    if n % ALIGN or n < W:
        raise ValueError(
            f"data length {n} must be an ALIGN={ALIGN} multiple >= {W} "
            f"(pad once with pad_to_align)")
    block = min(_block_for(length), B)
    while B % block:
        block //= 2
    assert block >= 1, f"pad offsets to a multiple of {block_multiple(length)}"
    offs = offsets.astype(jnp.int32)
    aligned = jnp.clip((offs // ALIGN) * ALIGN, 0, n - W)
    rem = (offs - aligned).reshape(B, 1)
    ncols = 3 if znorm else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda g, offs: (g, 0),
                         memory_space=pltpu.VMEM),   # remainders
            pl.BlockSpec(memory_space=pltpu.ANY),  # data stays in HBM
            pl.BlockSpec((1, length), lambda g, offs: (0, 0),
                         memory_space=pltpu.VMEM),   # query resident in VMEM
        ],
        out_specs=pl.BlockSpec((block, ncols), lambda g, offs: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, block, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2, block)),
        ],
    )
    out = pl.pallas_call(
        _ed_kernel(length, znorm, block),
        out_shape=jax.ShapeDtypeStruct((B, ncols), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=2 * block * W * 4 + length * 4
            + 4 * 1024 * 1024),
    )(aligned, rem, data, query.reshape(1, length))
    if znorm:
        return out[:, 0], out[:, 1], out[:, 2]
    return out[:, 0]


def block_multiple(length: int) -> int:
    """Callers pad their offset batch to a multiple of this."""
    return _block_for(length)


def pad_to_align(data: jnp.ndarray) -> jnp.ndarray:
    """Right-pad a 1-D series to an ALIGN multiple plus one ALIGN slack block
    (edge value) so every aligned superset window stays in bounds.  Pad ONCE
    outside any timed loop — this copies the array."""
    n = data.shape[0]
    pad = (-n) % ALIGN + ALIGN
    return jnp.concatenate([data, jnp.broadcast_to(data[-1:], (pad,))])
