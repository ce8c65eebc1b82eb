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


def test_envelope_matches_reference_semantics():
    """Edge-clamped min/max window (DtwUtils.lowerUpperLemire)."""
    rng = np.random.default_rng(4)
    x = rng.normal(size=50)
    r = 7
    lo, hi = envelope(x, r)
    for i in range(50):
        sl = x[max(0, i - r): min(50, i + r + 1)]
        assert lo[i] == sl.min() and hi[i] == sl.max()
