"""Pallas verify kernels vs the XLA kernels (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kvmatch_tpu.ops.ed import ed_distances, znorm_ed_distances
from kvmatch_tpu.ops.pallas_ed import window_distances_pallas

pytestmark = pytest.mark.slow  # multi-minute XLA-compile-heavy; quick lane skips


INTERPRET = jax.default_backend() != "tpu"


@pytest.fixture(scope="module")
def problem():
    from kvmatch_tpu.ops.pallas_ed import pad_to_align
    rng = np.random.default_rng(0)
    n, L, B = 20_000, 512, 64
    data = rng.normal(size=n).astype(np.float32)
    q = rng.normal(size=L).astype(np.float32)
    offs = rng.integers(0, n - L, B).astype(np.int32)
    # production contract: the series is aligned-padded once, outside any
    # timed loop (kernel DMAs copy aligned superset windows)
    data = np.asarray(pad_to_align(jnp.asarray(data)))
    return data, q, offs, L


def test_pallas_ed_matches_xla(problem):
    data, q, offs, L = problem
    ref = np.asarray(ed_distances(jnp.asarray(data), jnp.asarray(q),
                                  jnp.asarray(offs), L))
    got = np.asarray(window_distances_pallas(jnp.asarray(data), jnp.asarray(q),
                                             jnp.asarray(offs), L,
                                             interpret=INTERPRET))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-3)


def test_pallas_znorm_matches_xla(problem):
    data, q, offs, L = problem
    qh = (q - q.mean()) / q.std()
    ref_d2, ref_mu, ref_sd = (np.asarray(a) for a in znorm_ed_distances(
        jnp.asarray(data), jnp.asarray(qh), jnp.asarray(offs), L))
    d2, mu, sd = window_distances_pallas(jnp.asarray(data), jnp.asarray(qh),
                                         jnp.asarray(offs), L, znorm=True,
                                         interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(mu), ref_mu, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sd), ref_sd, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2), ref_d2, rtol=1e-3, atol=1e-2)


def test_pallas_dtw_matches_f64():
    """dtw_banded_pallas_multi (interpret mode off-TPU) vs the exact f64 DP:
    agreement at f32 error scale over random and adversarial batches."""
    from kvmatch_tpu.ops.dtw import _dtw_banded_batch_f64_np
    from kvmatch_tpu.ops.dtw_pallas import dtw_banded_pallas_multi

    rng = np.random.default_rng(3)
    B, L, r = 16, 256, 13
    a = rng.normal(size=(B, L)).astype(np.float32)
    # adversarial rows: large common-mode offset + near-identical pair
    a[0] += 100.0
    a[1] = a[2] + 1e-3
    q = rng.normal(size=(B, L)).astype(np.float32)
    q[0] += 100.0
    got = np.asarray(dtw_banded_pallas_multi(
        jnp.asarray(a), jnp.asarray(q), r, interpret=INTERPRET))
    for b in range(B):
        ref = _dtw_banded_batch_f64_np(a[b:b + 1].astype(np.float64),
                                       q[b].astype(np.float64), r)[0]
        np.testing.assert_allclose(got[b], ref, rtol=3e-4, atol=1e-2)


def test_pallas_dtw_diag_matches_f64():
    """Anti-diagonal kernel vs the exact f64 DP over random + adversarial
    batches, including the band edges (r=0 diagonal-only, r >= L full DP)."""
    from kvmatch_tpu.ops.dtw import _dtw_banded_batch_f64_np
    from kvmatch_tpu.ops.dtw_pallas import dtw_banded_pallas_diag_multi

    rng = np.random.default_rng(5)
    for B, L, r in [(16, 256, 13), (5, 100, 7), (4, 128, 0), (3, 64, 200),
                    (8, 300, 29)]:
        a = rng.normal(size=(B, L)).astype(np.float32)
        a[0] += 100.0
        if B > 2:
            a[1] = a[2] + 1e-3
        q = rng.normal(size=(B, L)).astype(np.float32)
        q[0] += 100.0
        got = np.asarray(dtw_banded_pallas_diag_multi(
            jnp.asarray(a), jnp.asarray(q), r, interpret=INTERPRET))
        for b in range(B):
            ref = _dtw_banded_batch_f64_np(a[b:b + 1].astype(np.float64),
                                           q[b].astype(np.float64),
                                           min(r, L - 1))[0]
            np.testing.assert_allclose(got[b], ref, rtol=3e-4, atol=1e-2,
                                       err_msg=f"B={B} L={L} r={r} row={b}")


def test_pallas_dtw_diag_matches_row_kernel():
    """Both Pallas formulations compute the same distances (f32 tolerance)."""
    from kvmatch_tpu.ops.dtw_pallas import (dtw_banded_pallas_diag_multi,
                                            dtw_banded_pallas_multi)

    rng = np.random.default_rng(6)
    B, L, r = 12, 384, 21
    a = rng.normal(size=(B, L)).astype(np.float32)
    q = rng.normal(size=(B, L)).astype(np.float32)
    d = np.asarray(dtw_banded_pallas_diag_multi(
        jnp.asarray(a), jnp.asarray(q), r, interpret=INTERPRET))
    w = np.asarray(dtw_banded_pallas_multi(
        jnp.asarray(a), jnp.asarray(q), r, interpret=INTERPRET))
    np.testing.assert_allclose(d, w, rtol=3e-4, atol=1e-3)


def test_pallas_dtw_odd_shapes():
    """Non-128-multiple L and B exercise the padding paths."""
    from kvmatch_tpu.ops.dtw import _dtw_banded_batch_f64_np
    from kvmatch_tpu.ops.dtw_pallas import dtw_banded_pallas_multi

    rng = np.random.default_rng(4)
    B, L, r = 5, 100, 7
    a = rng.normal(size=(B, L)).astype(np.float32)
    q = rng.normal(size=(B, L)).astype(np.float32)
    got = np.asarray(dtw_banded_pallas_multi(
        jnp.asarray(a), jnp.asarray(q), r, interpret=INTERPRET))
    for b in range(B):
        ref = _dtw_banded_batch_f64_np(a[b:b + 1].astype(np.float64),
                                       q[b].astype(np.float64), r)[0]
        np.testing.assert_allclose(got[b], ref, rtol=3e-4, atol=1e-3)
