"""Region (conv/MASS) phase-2 kernels vs direct float64 evaluation."""

import jax.numpy as jnp
import numpy as np
import pytest

from kvmatch_tpu.ops.regions import (pack_regions, region_ed_distances,
                                     region_znorm_distances)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(3)
    n, L = 50_000, 512
    # random-walk-ish data with a big DC offset to stress the raw-path numerics
    data = np.cumsum(rng.normal(0, 0.5, n)) + 100.0
    q = data[20_000:20_000 + L] + rng.normal(0, 0.05, L)
    return data, q, n, L


def test_pack_regions_covers_all_offsets(problem):
    data, q, n, L = problem
    left = np.array([0, 100, 5000, n - L - 3], np.int64)
    right = np.array([0, 940, 5010, n - L], np.int64)
    M = 256
    starts, vfrom, vto = pack_regions(left, right, n, L, M)
    covered = set()
    for s, a, b in zip(starts, vfrom, vto):
        assert 0 <= s and s + M + L - 1 <= n
        assert 0 <= a < b <= M
        covered.update(range(s + a, s + b))
    want = set()
    for l, r in zip(left, right):
        want.update(range(l, r + 1))
    assert covered == want


def test_region_ed_matches_direct(problem):
    data, q, n, L = problem
    M = 128
    left = np.array([900, 19_900], np.int64)
    right = np.array([1100, 20_100], np.int64)
    starts, vfrom, vto = pack_regions(left, right, n, L, M)
    c = float(data.mean())
    d32 = jnp.asarray(data, jnp.float32)
    q32 = jnp.asarray(q - c, jnp.float32)
    d2, err = region_ed_distances(d32, q32, jnp.asarray(starts, jnp.int32), L, M,
                                  np.float32(c))
    d2, err = np.asarray(d2), np.asarray(err)
    for b, (s, a, e) in enumerate(zip(starts, vfrom, vto)):
        for j in range(a, e):
            off = s + j
            exact = float(np.sum((data[off:off + L] - q) ** 2))
            assert abs(d2[b, j] - exact) <= err[b, j] + 1e-3 * (exact + 1), \
                (off, d2[b, j], exact, err[b, j])


def test_region_znorm_matches_direct(problem):
    data, q, n, L = problem
    M = 128
    left = np.array([19_900], np.int64)
    right = np.array([20_100], np.int64)
    starts, vfrom, vto = pack_regions(left, right, n, L, M)
    mu_q, sd_q = q.mean(), q.std()
    qh = (q - mu_q) / sd_q
    d2, mu, sd = region_znorm_distances(jnp.asarray(data, jnp.float32),
                                        jnp.asarray(qh, jnp.float32),
                                        jnp.asarray(starts, jnp.int32), L, M)
    d2, mu, sd = np.asarray(d2), np.asarray(mu), np.asarray(sd)
    for b, (s, a, e) in enumerate(zip(starts, vfrom, vto)):
        for j in range(a, e, 17):
            off = s + j
            x = data[off:off + L]
            m_h, s_h = x.mean(), x.std()
            exact = float(np.sum(((x - m_h) / s_h - qh) ** 2))
            assert abs(mu[b, j] - m_h) < 1e-2
            assert abs(sd[b, j] - s_h) < 1e-2
            assert abs(d2[b, j] - exact) <= 0.05 * (exact + 1.0), \
                (off, d2[b, j], exact)
