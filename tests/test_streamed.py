"""Streamed phase-2 mode (device_data='stream').

The engines must produce EXACTLY the same answer sets as the resident-mode
engines: staging candidate regions into a compact buffer (with halos) and
verifying in local coordinates is a pure re-addressing of the same reads.
Covers all four engines, the multi-group staging split, the f32 host-data
variant, and series-edge candidates (halo replication).
"""

import numpy as np
import pytest

from kvmatch_tpu.config import IndexConfig
from kvmatch_tpu.engine.norm_dtw import NormQueryEngineDtw
from kvmatch_tpu.engine.norm_ed import NormQueryEngine
from kvmatch_tpu.engine.rsm_dtw import QueryEngineDtw
from kvmatch_tpu.engine.rsm_ed import QueryEngine
from kvmatch_tpu.index.build import build_index_numpy

pytestmark = pytest.mark.slow  # multi-minute XLA-compile-heavy; quick lane skips


ENGINES = [
    (QueryEngine, {}),
    (QueryEngineDtw, {"rho": 20}),
    (NormQueryEngine, {"alpha": 1.3, "beta": 6.0}),
    (NormQueryEngineDtw, {"rho": 20, "alpha": 1.3, "beta": 6.0}),
]


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(42)
    data = np.cumsum(rng.standard_normal(120_000)) * 0.25
    idx = build_index_numpy(data)
    return data, idx


def _answers(res):
    return set(np.asarray(res.offsets).tolist())


@pytest.mark.parametrize("cls,params", ENGINES,
                         ids=[c.__name__ for c, _ in ENGINES])
def test_streamed_matches_resident(setup, cls, params):
    data, idx = setup
    res_e = cls(data, index=idx, icfg=IndexConfig())
    str_e = cls(data, index=idx, icfg=IndexConfig(), device_data="stream")
    assert str_e.data_dev is None
    cases = [(1234, 512, 5.0), (77_777, 1024, 8.0),
             (0, 512, 4.0), (120_000 - 512, 512, 4.0)]  # series edges
    for off, L, eps in cases:
        q = data[off:off + L]
        a = res_e.query(q, eps, **params)
        b = str_e.query(q, eps, **params)
        assert _answers(a) == _answers(b)
        assert off in _answers(b)
        np.testing.assert_allclose(np.sort(a.distances), np.sort(b.distances),
                                   rtol=0, atol=1e-9)


@pytest.mark.parametrize("cls,params", ENGINES[:2],
                         ids=[c.__name__ for c, _ in ENGINES[:2]])
def test_streamed_multi_group(setup, cls, params):
    """Forcing a tiny staging budget splits verification into many groups;
    answers must be unchanged."""
    data, idx = setup
    res_e = cls(data, index=idx, icfg=IndexConfig())
    str_e = cls(data, index=idx, icfg=IndexConfig(), device_data="stream")
    str_e.STREAM_MAX_STAGE = 1 << 13
    offs = [5_000, 30_000, 60_000, 90_000]
    L, eps = 512, 6.0
    qs = np.stack([data[o:o + L] for o in offs])
    a = res_e.query_batch(qs, eps, **params)
    b = str_e.query_batch(qs, eps, **params)
    for o, ra, rb in zip(offs, a, b):
        assert _answers(ra) == _answers(rb)
        assert o in _answers(rb)


def test_streamed_f32_host(setup):
    """f32 host data (the no-f64-shadow big-series layout): answers equal a
    resident engine over the f64 promotion of the same f32 values."""
    data, _ = setup
    d32 = data.astype(np.float32)
    d64 = d32.astype(np.float64)
    idx = build_index_numpy(d64)
    res_e = QueryEngine(d64, index=idx, icfg=IndexConfig())
    str_e = QueryEngine(d32, index=idx, icfg=IndexConfig(),
                        device_data="stream")
    assert str_e.data.dtype == np.float32
    for off, L, eps in [(1234, 512, 5.0), (50_000, 1024, 8.0)]:
        a = res_e.query(d64[off:off + L], eps)
        b = str_e.query(str_e.data[off:off + L], eps)
        assert _answers(a) == _answers(b)


def test_streamed_batch_device_falls_back(setup):
    data, idx = setup
    str_e = QueryEngine(data, index=idx, icfg=IndexConfig(),
                        device_data="stream")
    offs = [5_000, 30_000]
    L, eps = 512, 6.0
    qs = np.stack([data[o:o + L] for o in offs])
    res = str_e.query_batch_device(qs, eps)
    for o, r in zip(offs, res):
        assert o in _answers(r)


def test_streamed_requires_index(setup):
    data, _ = setup
    with pytest.raises(ValueError, match="stream"):
        QueryEngine(data, index=None, icfg=IndexConfig(),
                    device_data="stream")


def test_host_only_mode_answers_and_overflow():
    """device_data='host': tiny loads answer exactly via the host f64 route
    (no device); loads beyond host_verify_max_points raise instead of
    touching a device."""
    import dataclasses

    import numpy as np
    import pytest
    from kvmatch_tpu.config import IndexConfig, QueryConfig
    from kvmatch_tpu.data.generators import generate_series
    from kvmatch_tpu.engine.rsm_ed import QueryEngine
    from kvmatch_tpu.index.build import build_index_numpy

    data = generate_series(100_000, seed=21).astype(np.float32)
    icfg = IndexConfig()
    index = build_index_numpy(data.astype(np.float64), icfg)
    qcfg = QueryConfig()
    host = QueryEngine(data, index=index, icfg=icfg, qcfg=qcfg,
                       device_data="host")
    ref = QueryEngine(data.astype(np.float64), index=index, icfg=icfg,
                      qcfg=qcfg)
    off, L, eps = 40_000, 512, 5.0
    q = data[off:off + L].astype(np.float64)
    rh = host.query(q, eps)
    rr = ref.query(q, eps)
    assert rh.offsets.tolist() == rr.offsets.tolist()
    assert np.allclose(rh.distances, rr.distances)
    assert off in rh.offsets.tolist()
    assert rh.stats.n_host_checked > 0

    # with the direct route AND the prefilter tier both capped out, the
    # host-only engine must refuse rather than touch a device
    tiny_cap = QueryEngine(data, index=index, icfg=icfg,
                           qcfg=dataclasses.replace(
                               qcfg, host_verify_max_points=1,
                               host_prefilter_max_offsets=0),
                           device_data="host")
    with pytest.raises(RuntimeError, match="host-only"):
        tiny_cap.query(q, eps)


def test_host_only_dtw_matches_device_route():
    """host-only DTW engines answer tiny loads exactly via the f64 host
    pipeline (LB_Keogh prefilter + early-abandoning banded DP)."""
    import numpy as np
    from kvmatch_tpu.config import IndexConfig, QueryConfig
    from kvmatch_tpu.data.generators import generate_series
    from kvmatch_tpu.engine.norm_dtw import NormQueryEngineDtw
    from kvmatch_tpu.engine.rsm_dtw import QueryEngineDtw
    from kvmatch_tpu.index.build import build_index_numpy

    data = generate_series(60_000, seed=23)
    icfg = IndexConfig()
    index = build_index_numpy(data, icfg)
    qcfg = QueryConfig(host_verify_max_points=1 << 26)
    for cls, kw in [(QueryEngineDtw, {}),
                    (NormQueryEngineDtw, {"alpha": 1.4, "beta": 8.0})]:
        host = cls(data.astype(np.float32), index=index, icfg=icfg,
                   qcfg=qcfg, device_data="host")
        dev = cls(data, index=index, icfg=icfg, qcfg=QueryConfig())
        off, L = 12_000, 512
        q = data[off:off + L]
        rh = host.query(q, 4.0, rho=25, **kw)
        rd = dev.query(q, 4.0, rho=25, **kw)
        assert rh.offsets.tolist() == rd.offsets.tolist()
        # the host engine stores f32 data (stream-mode semantics), so its
        # exact-f64 distances differ by the f32 input quantization only
        assert np.allclose(rh.distances, rd.distances, rtol=1e-5, atol=1e-4)
        assert off in rh.offsets.tolist()
        assert rh.stats.n_host_checked > 0


def test_sparse_prefix_matches_dense_cumsum():
    """SparsePrefix differences inside covered windows equal the dense
    cumsum's for sums and sums of squares, across merged/disjoint runs."""
    from kvmatch_tpu.utils.sparse_prefix import sparse_prefixes

    rng = np.random.default_rng(7)
    data = rng.standard_normal(10_000)
    dense1 = np.concatenate(([0.0], np.cumsum(data)))
    dense2 = np.concatenate(([0.0], np.cumsum(data * data)))
    L = 64
    left = np.array([100, 150, 400, 5000, 9000], np.int64)
    right = np.array([120, 300, 410, 5500, 9936 - L + 64], np.int64)
    right = np.minimum(right, 10_000 - L)
    c1, c2, staged = sparse_prefixes(data, left, right, L, want_sq=True)
    assert staged < data.size + (L + 1) * left.size
    for lo, hi in zip(left, right):
        offs = np.arange(lo, hi + 1)
        np.testing.assert_allclose(c1[offs + L] - c1[offs],
                                   dense1[offs + L] - dense1[offs],
                                   rtol=1e-12, atol=1e-9)
        np.testing.assert_allclose(c2[offs + L] - c2[offs],
                                   dense2[offs + L] - dense2[offs],
                                   rtol=1e-12, atol=1e-9)
        # block lookups, 2D index shapes
        blk = offs[:, None] + np.arange(0, L, 16)[None, :]
        np.testing.assert_allclose(c1[blk + 16] - c1[blk],
                                   dense1[blk + 16] - dense1[blk],
                                   rtol=1e-12, atol=1e-9)

    # budget refusal
    n1, n2, tot = sparse_prefixes(data, left, right, L, max_staged=10)
    assert n1 is None and n2 is None and tot > 10


def test_host_prefilter_tier_matches_reference():
    """Mid-size host-only loads (beyond host_verify_max_points) answer via
    the run-local prefilter tier with answer sets equal to the full engine;
    with the tier disabled the same load raises."""
    import dataclasses

    from kvmatch_tpu.config import QueryConfig
    from kvmatch_tpu.data.generators import generate_series
    from kvmatch_tpu.index.build import build_index_numpy

    data = generate_series(120_000, seed=29)
    icfg = IndexConfig()
    index = build_index_numpy(data, icfg)
    # direct host route limited to ~1024 offsets at L=512 — the chosen
    # epsilons produce larger phase-1 loads, forcing the tier
    qcfg = QueryConfig(host_verify_max_points=1 << 19,
                       host_prefilter_max_offsets=1 << 22)
    qcfg_notier = dataclasses.replace(qcfg, host_prefilter_max_offsets=0)
    cases = [
        (QueryEngine, {}, 20.0),
        (QueryEngineDtw, {"rho": 25}, 18.0),
        (NormQueryEngine, {"alpha": 1.3, "beta": 6.0}, 6.0),
        (NormQueryEngineDtw, {"rho": 25, "alpha": 1.3, "beta": 6.0}, 5.0),
    ]
    off, L = 40_000, 512
    q = data[off:off + L]
    for cls, kw, eps in cases:
        ref = cls(data, index=index, icfg=icfg)
        host = cls(data, index=index, icfg=icfg, qcfg=qcfg,
                   device_data="host")
        rr = ref.query(q, eps, **kw)
        rh = host.query(q, eps, **kw)
        assert rh.offsets.tolist() == rr.offsets.tolist(), cls.__name__
        # the reference path confirms in f32 on device (+ guarded f64
        # rechecks); the tier is exact f64 throughout
        np.testing.assert_allclose(np.sort(rh.distances),
                                   np.sort(rr.distances),
                                   rtol=1e-5, atol=1e-4)
        assert off in rh.offsets.tolist()
        # the direct host route must have been over-cap for this load —
        # proven by the no-tier config raising on the identical query
        notier = cls(data, index=index, icfg=icfg, qcfg=qcfg_notier,
                     device_data="host")
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="host-only"):
            notier.query(q, eps, **kw)
