"""Answer-set parity: cNSM-ED engine vs the float64 oracle."""

import numpy as np
import pytest

from kvmatch_tpu import oracle
from kvmatch_tpu.config import IndexConfig, QueryConfig
from kvmatch_tpu.data.generators import generate_series
from kvmatch_tpu.engine.norm_ed import NormQueryEngine
from kvmatch_tpu.index.build import build_index_tpu

N = 60_000


@pytest.fixture(scope="module")
def setup():
    data = generate_series(N, seed=7)
    icfg = IndexConfig()
    index = build_index_tpu(data, icfg)
    engine = NormQueryEngine(data, index=index, icfg=icfg)
    return data, engine


def _check(engine, data, offset, length, epsilon, alpha, beta):
    res = engine.query_at(offset, length, epsilon, alpha=alpha, beta=beta)
    oo, od = oracle.nsm_ed(data, data[offset:offset + length], epsilon,
                           alpha=alpha, beta=beta)
    got = set(res.offsets.tolist())
    want = set(oo.tolist())
    assert got == want, (
        f"offset={offset} L={length} eps={epsilon} a={alpha} b={beta}: "
        f"missing={sorted(want - got)[:5]} extra={sorted(got - want)[:5]}")
    assert offset in got


@pytest.mark.parametrize("offset,length,epsilon,alpha,beta", [
    (123, 400, 2.0, 1.5, 20.0),
    (1234, 1600, 5.0, 1.1, 8.0),
    (30000, 4096, 8.0, 2.0, 30.0),
    (7777, 800, 1.0, 1.2, 5.0),
    (2048, 256, 4.0, 1.5, 50.0),
])
def test_self_query_parity(setup, offset, length, epsilon, alpha, beta):
    data, engine = setup
    _check(engine, data, offset, length, epsilon, alpha, beta)


def test_random_queries_parity(setup):
    data, engine = setup
    rng = np.random.default_rng(5)
    for _ in range(6):
        length = int(rng.choice([100, 250, 775, 1525]))
        offset = int(rng.integers(0, N - length))
        epsilon = float(rng.choice([1.0, 4.0, 12.0]))
        alpha = float(rng.choice([1.1, 1.5, 2.0]))
        beta = float(rng.choice([3.0, 12.0, 40.0]))
        _check(engine, data, offset, length, epsilon, alpha, beta)


def test_filters_off_still_exact(setup):
    """Std filter / beta partition disabled must give identical answers."""
    data, engine = setup
    from kvmatch_tpu.engine.norm_ed import NormQueryEngine
    qcfg = QueryConfig(enable_std_filter=False, enable_beta_partition=False)
    plain = NormQueryEngine(data, index=engine.index, icfg=engine.icfg, qcfg=qcfg,
                            device_data=engine.data_dev)
    for off, L, eps, a, b in [(1234, 1600, 5.0, 1.1, 8.0), (7777, 800, 1.0, 1.2, 5.0)]:
        r1 = engine.query_at(off, L, eps, alpha=a, beta=b)
        r2 = plain.query_at(off, L, eps, alpha=a, beta=b)
        assert set(r1.offsets.tolist()) == set(r2.offsets.tolist())


def test_plain_nsm_rejected_with_pointer():
    """Unconstrained NSM can't use the mean index; the engine must say so and
    point at the full-scan path rather than raise a raw KeyError."""
    import pytest
    from kvmatch_tpu.config import IndexConfig
    from kvmatch_tpu.data.generators import generate_series
    from kvmatch_tpu.engine.norm_ed import NormQueryEngine
    from kvmatch_tpu.index.build import build_index_numpy

    data = generate_series(30_000, seed=2)
    eng = NormQueryEngine(data, index=build_index_numpy(data, IndexConfig()))
    with pytest.raises(ValueError, match="scan_nsm_ed"):
        eng.query_at(7000, 512, 2.0)


def test_constant_query_rejected():
    """sigma_Q = 0 makes z-normalization undefined; must be a clean error,
    not a ZeroDivisionError mid-probe."""
    import pytest
    from kvmatch_tpu.config import IndexConfig
    from kvmatch_tpu.data.generators import generate_series
    from kvmatch_tpu.engine.norm_ed import NormQueryEngine
    from kvmatch_tpu.index.build import build_index_numpy

    data = generate_series(30_000, seed=2)
    eng = NormQueryEngine(data, index=build_index_numpy(data, IndexConfig()))
    with pytest.raises(ValueError, match="standard deviation"):
        eng.query(np.full(512, 3.0), 2.0, alpha=1.3, beta=5.0)
