"""Answer-set parity: RSM-DTW and cNSM-DTW engines vs the float64 oracle."""

import pytest

from kvmatch_tpu import oracle
from kvmatch_tpu.config import IndexConfig
from kvmatch_tpu.data.generators import generate_series
from kvmatch_tpu.engine.norm_dtw import NormQueryEngineDtw
from kvmatch_tpu.engine.rsm_dtw import QueryEngineDtw
from kvmatch_tpu.index.build import build_index_tpu

N = 20_000


@pytest.fixture(scope="module")
def setup():
    data = generate_series(N, seed=9)
    icfg = IndexConfig()
    index = build_index_tpu(data, icfg)
    return data, index, icfg


@pytest.mark.parametrize("offset,length,epsilon,rho_frac", [
    (500, 128, 2.0, 0.05),
    (3000, 256, 6.0, 0.05),
    (12000, 512, 10.0, 0.1),
])
def test_rsm_dtw_parity(setup, offset, length, epsilon, rho_frac):
    data, index, icfg = setup
    engine = QueryEngineDtw(data, index=index, icfg=icfg)
    rho = int(rho_frac * length)
    res = engine.query_at(offset, length, epsilon, rho=rho)
    oo, od = oracle.rsm_dtw(data, data[offset:offset + length], epsilon, rho)
    got, want = set(res.offsets.tolist()), set(oo.tolist())
    assert got == want, f"missing={sorted(want-got)[:5]} extra={sorted(got-want)[:5]}"
    assert offset in got


@pytest.mark.parametrize("offset,length,epsilon,rho_frac,alpha,beta", [
    (700, 128, 2.0, 0.05, 1.5, 10.0),
    (5000, 256, 5.0, 0.05, 1.2, 6.0),
    (11000, 512, 8.0, 0.1, 2.0, 25.0),
])
def test_cnsm_dtw_parity(setup, offset, length, epsilon, rho_frac, alpha, beta):
    data, index, icfg = setup
    engine = NormQueryEngineDtw(data, index=index, icfg=icfg)
    rho = int(rho_frac * length)
    res = engine.query_at(offset, length, epsilon, rho=rho, alpha=alpha, beta=beta)
    oo, od = oracle.cnsm_dtw(data, data[offset:offset + length], epsilon, rho,
                             alpha, beta)
    got, want = set(res.offsets.tolist()), set(oo.tolist())
    assert got == want, f"missing={sorted(want-got)[:5]} extra={sorted(got-want)[:5]}"
    assert offset in got


def test_rsm_dtw_rho_zero_equals_ed(setup):
    """rho=0 DTW must reduce to plain Euclidean matching."""
    data, index, icfg = setup
    from kvmatch_tpu.engine.rsm_ed import QueryEngine
    dtw = QueryEngineDtw(data, index=index, icfg=icfg)
    ed = QueryEngine(data, index=index, icfg=icfg, device_data=dtw.data_dev)
    r1 = dtw.query_at(2500, 200, 5.0, rho=0)
    r2 = ed.query_at(2500, 200, 5.0)
    assert set(r1.offsets.tolist()) == set(r2.offsets.tolist())


@pytest.mark.slow  # ~2 min of XLA compiles; the quick lane keeps the
# parametrized parity tests that cover the same kernels
def test_skip_lb_route_matches_cascade_route():
    """dtw_skip_lb_max routes tiny candidate sets straight to the banded DP;
    answers must equal the LB-cascade route's exactly (the cascade is only a
    prefilter)."""
    import numpy as np
    from kvmatch_tpu.config import IndexConfig, QueryConfig
    from kvmatch_tpu.data.generators import generate_series
    from kvmatch_tpu.engine.norm_dtw import NormQueryEngineDtw
    from kvmatch_tpu.engine.rsm_dtw import QueryEngineDtw
    from kvmatch_tpu.index.build import build_index_numpy

    data = generate_series(50_000, seed=13)
    icfg = IndexConfig()
    index = build_index_numpy(data, icfg)
    for cls, kw in [(QueryEngineDtw, {}),
                    (NormQueryEngineDtw, {"alpha": 1.4, "beta": 8.0})]:
        skip = cls(data, index=index, icfg=icfg,
                   qcfg=QueryConfig(dtw_skip_lb_max=1 << 30))
        casc = cls(data, index=index, icfg=icfg,
                   qcfg=QueryConfig(dtw_skip_lb_max=0))
        for off, L, eps in [(4000, 512, 5.0), (30000, 256, 4.0)]:
            q = data[off:off + L]
            rs = skip.query(q, eps, rho=int(0.05 * L), **kw)
            rc = casc.query(q, eps, rho=int(0.05 * L), **kw)
            assert rs.offsets.tolist() == rc.offsets.tolist()
            assert np.allclose(rs.distances, rc.distances)
            assert off in rs.offsets.tolist()
