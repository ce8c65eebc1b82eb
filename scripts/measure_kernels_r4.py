"""Round-4 kernel-bar measurement on the real TPU: gather-ED GB/s and banded
DTW cands/s (VERDICT r3 next #2), printed as JSON."""
import json
import sys

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_kvmatch")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    print("devices:", jax.devices(), file=sys.stderr)
    from kvmatch_tpu.data.generators import generate_series
    from kvmatch_tpu.ops.ed import pad_to_tiles
    from kvmatch_tpu.utils.kernel_bench import measure_kernel_efficiency
    n = 1 << 24
    data = generate_series(n, seed=7)
    data_dev = pad_to_tiles(jnp.asarray(data, jnp.float32))
    _ = np.asarray(jnp.ones(8))  # warm link
    out = measure_kernel_efficiency(data_dev, reps=8)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
