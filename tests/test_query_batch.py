"""query_batch must agree with per-query results (fused multi-query verify)."""

import numpy as np
import pytest

from kvmatch_tpu.config import IndexConfig
from kvmatch_tpu.data.generators import generate_series
from kvmatch_tpu.engine.norm_ed import NormQueryEngine
from kvmatch_tpu.engine.rsm_ed import QueryEngine
from kvmatch_tpu.index.build import build_index_tpu

N = 40_000


@pytest.fixture(scope="module")
def setup():
    data = generate_series(N, seed=17)
    icfg = IndexConfig()
    index = build_index_tpu(data, icfg)
    return data, index, icfg


def test_rsm_ed_batch_matches_single(setup):
    data, index, icfg = setup
    engine = QueryEngine(data, index=index, icfg=icfg)
    L = 512
    offs = [1000, 7000, 15000, 22000, 30000]
    queries = np.stack([data[o:o + L] for o in offs])
    batch = engine.query_batch(queries, 6.0)
    assert len(batch) == len(offs)
    for o, res in zip(offs, batch):
        single = engine.query_at(o, L, 6.0)
        assert set(res.offsets.tolist()) == set(single.offsets.tolist())
        assert o in res.offsets.tolist()


def test_norm_ed_batch_matches_single(setup):
    data, index, icfg = setup
    engine = NormQueryEngine(data, index=index, icfg=icfg)
    L = 400
    offs = [2000, 11000, 26000]
    queries = np.stack([data[o:o + L] for o in offs])
    batch = engine.query_batch(queries, 3.0, alpha=1.5, beta=15.0)
    for o, res in zip(offs, batch):
        single = engine.query_at(o, L, 3.0, alpha=1.5, beta=15.0)
        assert set(res.offsets.tolist()) == set(single.offsets.tolist())
        assert o in res.offsets.tolist()


def test_batch_per_query_epsilon(setup):
    data, index, icfg = setup
    engine = QueryEngine(data, index=index, icfg=icfg)
    L = 256
    offs = [3000, 9000]
    queries = np.stack([data[o:o + L] for o in offs])
    batch = engine.query_batch(queries, np.array([2.0, 8.0]))
    for o, eps, res in zip(offs, [2.0, 8.0], batch):
        single = engine.query_at(o, L, eps)
        assert set(res.offsets.tolist()) == set(single.offsets.tolist())


def test_dtw_batch_matches_single(setup):
    data, index, icfg = setup
    from kvmatch_tpu.engine.rsm_dtw import QueryEngineDtw
    engine = QueryEngineDtw(data, index=index, icfg=icfg)
    L, rho = 256, 12
    offs = [1500, 8000, 20000]
    queries = np.stack([data[o:o + L] for o in offs])
    batch = engine.query_batch(queries, 4.0, rho=rho)
    for o, res in zip(offs, batch):
        single = engine.query_at(o, L, 4.0, rho=rho)
        assert set(res.offsets.tolist()) == set(single.offsets.tolist())
        assert o in res.offsets.tolist()


def test_norm_dtw_batch_matches_single(setup):
    data, index, icfg = setup
    from kvmatch_tpu.engine.norm_dtw import NormQueryEngineDtw
    engine = NormQueryEngineDtw(data, index=index, icfg=icfg)
    L, rho = 256, 12
    offs = [2500, 13000, 31000]
    queries = np.stack([data[o:o + L] for o in offs])
    batch = engine.query_batch(queries, 3.0, rho=rho, alpha=1.3, beta=12.0)
    for o, res in zip(offs, batch):
        single = engine.query_at(o, L, 3.0, rho=rho, alpha=1.3, beta=12.0)
        assert set(res.offsets.tolist()) == set(single.offsets.tolist())
        assert o in res.offsets.tolist()


def test_batched_planning_identical_to_per_query():
    """determine_query_plans_batched == per-query determine_query_plan for all
    four engines (same segments, same order)."""
    import numpy as np
    from kvmatch_tpu.config import IndexConfig
    from kvmatch_tpu.data.generators import generate_series
    from kvmatch_tpu.engine.base import _Ctx, QueryStats
    from kvmatch_tpu.engine.norm_dtw import NormQueryEngineDtw
    from kvmatch_tpu.engine.norm_ed import NormQueryEngine
    from kvmatch_tpu.engine.rsm_dtw import QueryEngineDtw
    from kvmatch_tpu.engine.rsm_ed import QueryEngine
    from kvmatch_tpu.index.build import build_index_numpy

    data = generate_series(60_000, seed=17)
    icfg = IndexConfig()
    index = build_index_numpy(data, icfg)
    rng = np.random.default_rng(4)
    L = 512
    offs = rng.integers(0, data.size - L, 6)
    queries = np.stack([data[o:o + L] for o in offs])
    cases = [
        (QueryEngine, {}),
        (QueryEngineDtw, {"rho": 25}),
        (NormQueryEngine, {"alpha": 1.3, "beta": 8.0}),
        (NormQueryEngineDtw, {"rho": 25, "alpha": 1.3, "beta": 8.0}),
    ]
    for cls, params in cases:
        eng = cls(data, index=index, icfg=icfg)
        ctxs = [_Ctx(query=q, length=L, epsilon=4.0, eps2=16.0,
                     params=dict(params), stats=QueryStats()) for q in queries]
        batched = eng._plan_batch(ctxs)
        singles = [eng._plan(_Ctx(query=q, length=L, epsilon=4.0, eps2=16.0,
                                  params=dict(params), stats=QueryStats()))
                   for q in queries]
        assert batched == singles, cls.__name__
