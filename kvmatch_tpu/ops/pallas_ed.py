"""Pallas TPU kernel for the phase-2 hot loop: candidate-window distance batches.

The XLA fallback (ops/ed.py) materializes a (B, L) gather before reducing — two
full HBM round-trips for data that is consumed once.  This kernel streams each
candidate window HBM->VMEM with explicit async DMAs (the windows are contiguous
length-L runs, so each DMA moves one 4*L-byte block at full bandwidth), overlaps the
copies of a block of candidates, and reduces in VMEM without ever writing the
gathered matrix back to HBM:

  grid step g:  start BLOCK DMAs  data[off_b : off_b+L] -> scratch[b]
                wait, compute     d2[b] = sum((scratch[b] - q)^2)   (VPU)
                write             out[g*BLOCK + b]

Offsets arrive via scalar prefetch (pltpu.PrefetchScalarGridSpec) so the DMA
addresses are known before the body runs.  The raw-ED and z-normalized variants
share the layout; both are exercised against the XLA kernels in
tests/test_pallas_kernels.py (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 8  # candidates per grid step (f32 sublane count)


def _ed_kernel(length: int, znorm: bool):
    def kernel(offs_ref, data_ref, q_ref, out_ref, scratch, sems):
        g = pl.program_id(0)

        def dma(t):
            off = offs_ref[g * BLOCK + t]
            return pltpu.make_async_copy(
                data_ref.at[pl.ds(off, length)], scratch.at[t], sems.at[t])

        for t in range(BLOCK):
            dma(t).start()
        for t in range(BLOCK):
            dma(t).wait()

        x = scratch[:]                       # (BLOCK, L)
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
    """d2 (and mean/std when znorm) for B candidate windows; B % BLOCK == 0.

    ``query`` must already be z-normalized when znorm=True.
    """
    B = offsets.shape[0]
    assert B % BLOCK == 0, f"pad offsets to a multiple of {BLOCK}"
    ncols = 3 if znorm else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // BLOCK,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # data stays in HBM
            pl.BlockSpec((1, length), lambda g, offs: (0, 0),
                         memory_space=pltpu.VMEM),   # query resident in VMEM
        ],
        out_specs=pl.BlockSpec((BLOCK, ncols), lambda g, offs: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLOCK, length), jnp.float32),
            pltpu.SemaphoreType.DMA((BLOCK,)),
        ],
    )
    out = pl.pallas_call(
        _ed_kernel(length, znorm),
        out_shape=jax.ShapeDtypeStruct((B, ncols), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=BLOCK * length * 4 + length * 4 + 1024 * 1024),
    )(offsets.astype(jnp.int32), data, query.reshape(1, length))
    if znorm:
        return out[:, 0], out[:, 1], out[:, 2]
    return out[:, 0]
