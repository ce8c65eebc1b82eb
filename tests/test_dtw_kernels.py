"""DTW kernel unit tests: batch DP (f64 + device f32) vs the scalar oracle DP."""

import numpy as np
import pytest

from kvmatch_tpu.oracle import dtw_banded
from kvmatch_tpu.ops.dtw import dtw_banded_batch, dtw_banded_batch_f64, lb_keogh, lb_kim
from kvmatch_tpu.plan import envelope


@pytest.mark.parametrize("L,r", [(16, 3), (50, 5), (100, 10), (64, 0), (30, 29), (33, 7)])
def test_batch_matches_scalar(L, r):
    rng = np.random.default_rng(1)
    A = rng.normal(size=(5, L))
    q = rng.normal(size=L)
    ref = np.array([dtw_banded(A[b], q, r) for b in range(5)])
    f64 = dtw_banded_batch_f64(A, q, r)
    np.testing.assert_allclose(f64, ref, rtol=1e-12)
    f32 = np.asarray(dtw_banded_batch(A.astype(np.float32), q.astype(np.float32), r))
    np.testing.assert_allclose(f32, ref, rtol=1e-4)


def test_r_zero_is_euclidean():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(4, 40))
    q = rng.normal(size=40)
    d2 = dtw_banded_batch_f64(A, q, 0)
    ed = ((A - q[None, :]) ** 2).sum(axis=1)
    np.testing.assert_allclose(d2, ed, rtol=1e-12)


def test_lower_bounds_are_lower(seed=3):
    """LB_Kim and LB_Keogh must never exceed the true banded DTW distance."""
    rng = np.random.default_rng(seed)
    L, r = 64, 6
    A = rng.normal(size=(32, L))
    q = rng.normal(size=L)
    lo, hi = envelope(q, r)
    true = dtw_banded_batch_f64(A, q, r)
    kim = np.asarray(lb_kim(A.astype(np.float32), q.astype(np.float32)))
    keogh = np.asarray(lb_keogh(A.astype(np.float32),
                                lo.astype(np.float32), hi.astype(np.float32)))
    assert (kim <= true + 1e-3).all()
    assert (keogh <= true + 1e-3).all()


def test_lb_stage_data_envelope_is_lower_bound():
    """The full cascade stage (LB_Kim + both Keogh directions, data envelope
    gathered from the GLOBAL series envelope) never exceeds true banded DTW —
    validity of the data-side Keogh of DtwUtils.java:238-257 in batch form."""
    import jax
    import jax.numpy as jnp
    from kvmatch_tpu.ops.dtw import lb_stage_multi
    from kvmatch_tpu.ops.sliding import sliding_min_max

    rng = np.random.default_rng(5)
    n, L, r = 4000, 64, 6
    data = np.cumsum(rng.normal(size=n)) * 0.1
    offs = rng.integers(0, n - L, size=128).astype(np.int32)
    q = data[100:100 + L] + rng.normal(size=L) * 0.05
    lo, hi = envelope(q, r)
    data32 = jnp.asarray(data, jnp.float32)
    d_lo, d_hi = jax.jit(sliding_min_max, static_argnums=1)(data32, r)
    lb = np.asarray(lb_stage_multi(
        data32, d_lo, d_hi, jnp.asarray(q[None, :], jnp.float32),
        jnp.asarray(lo[None, :], jnp.float32), jnp.asarray(hi[None, :], jnp.float32),
        jnp.asarray(offs), jnp.zeros(offs.size, jnp.int32), L))
    windows = data[offs[:, None] + np.arange(L)[None, :]]
    true = dtw_banded_batch_f64(windows, q, r)
    assert (lb <= true * (1 + 1e-4) + 1e-3).all()
    # the data-envelope direction must actually add pruning power somewhere:
    from kvmatch_tpu.ops.dtw import lb_keogh_multi, lb_kim_multi
    old = np.maximum(
        np.asarray(lb_kim_multi(jnp.asarray(windows, jnp.float32),
                                jnp.asarray(np.repeat(q[None, :], offs.size, 0),
                                            jnp.float32))),
        np.asarray(lb_keogh_multi(jnp.asarray(windows, jnp.float32),
                                  jnp.asarray(np.repeat(lo[None, :], offs.size, 0),
                                              jnp.float32),
                                  jnp.asarray(np.repeat(hi[None, :], offs.size, 0),
                                              jnp.float32))))
    assert (lb >= old - 1e-3).all()
    assert (lb > old + 1e-6).any(), "data envelope never tightened the bound"


def test_lb_stage_znorm_data_envelope_is_lower_bound():
    """z-space cascade with the window-affine-mapped data envelope lower-bounds
    banded DTW on z-normalized windows."""
    import jax
    import jax.numpy as jnp
    from kvmatch_tpu.ops.dtw import lb_stage_znorm_multi
    from kvmatch_tpu.ops.sliding import sliding_min_max

    rng = np.random.default_rng(6)
    n, L, r = 4000, 64, 6
    data = np.cumsum(rng.normal(size=n)) * 0.1
    offs = rng.integers(0, n - L, size=128).astype(np.int32)
    q = data[200:200 + L]
    mu_q, sd_q = q.mean(), q.std()
    zq = (q - mu_q) / sd_q
    lo, hi = envelope(zq, r)
    data32 = jnp.asarray(data, jnp.float32)
    d_lo, d_hi = jax.jit(sliding_min_max, static_argnums=1)(data32, r)
    cons = jnp.asarray([[1e9, 1e9, mu_q, sd_q, 0.0]], jnp.float32)  # no pruning
    lb = np.asarray(lb_stage_znorm_multi(
        data32, d_lo, d_hi, jnp.asarray(zq[None, :], jnp.float32),
        jnp.asarray(lo[None, :], jnp.float32), jnp.asarray(hi[None, :], jnp.float32),
        cons, jnp.asarray(offs), jnp.zeros(offs.size, jnp.int32), L))
    windows = data[offs[:, None] + np.arange(L)[None, :]]
    mu = windows.mean(axis=1, keepdims=True)
    sd = windows.std(axis=1, keepdims=True)
    z = (windows - mu) / np.where(sd > 0, sd, 1.0)
    true = dtw_banded_batch_f64(z, zq, r)
    assert (lb <= true * (1 + 1e-3) + 1e-2).all()


def test_envelope_matches_reference_semantics():
    """Edge-clamped min/max window (DtwUtils.lowerUpperLemire)."""
    rng = np.random.default_rng(4)
    x = rng.normal(size=50)
    r = 7
    lo, hi = envelope(x, r)
    for i in range(50):
        sl = x[max(0, i - r): min(50, i + r + 1)]
        assert lo[i] == sl.min() and hi[i] == sl.max()
