"""The scalar reference twin (measured baseline) must be EXACT: its answer
sets equal the float64 oracle's for every variant — that's what makes it a
faithful stand-in for the Java reference's phase-2 loops."""

import numpy as np
import pytest

from kvmatch_tpu import oracle
from kvmatch_tpu.baseline_twin import (ScalarTwinDtw, ScalarTwinEd,
                                       ScalarTwinNormDtw, ScalarTwinNormEd)
from kvmatch_tpu.config import IndexConfig
from kvmatch_tpu.data.generators import generate_series
from kvmatch_tpu.index.build import build_index_numpy
from kvmatch_tpu.native import get_baseline_lib

pytestmark = pytest.mark.skipif(get_baseline_lib() is None,
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def setup():
    data = generate_series(60_000, seed=21)
    icfg = IndexConfig()
    index = build_index_numpy(data, icfg)
    return data, icfg, index


def test_twin_rsm_ed_matches_oracle(setup):
    data, icfg, index = setup
    eng = ScalarTwinEd(data, index=index, icfg=icfg)
    for off, L, eps in [(9000, 512, 6.0), (30000, 256, 3.0)]:
        q = data[off:off + L]
        res = eng.query(q, eps)
        oo, od = oracle.rsm_ed(data, q, eps)
        assert set(res.offsets.tolist()) == set(oo.tolist())
        got = dict(zip(res.offsets.tolist(), res.distances.tolist()))
        ref = dict(zip(oo.tolist(), od.tolist()))
        for k in ref:
            assert got[k] == pytest.approx(ref[k], rel=1e-9)


def test_twin_cnsm_ed_matches_oracle(setup):
    data, icfg, index = setup
    eng = ScalarTwinNormEd(data, index=index, icfg=icfg)
    q = data[14000:14000 + 256]
    res = eng.query(q, 2.0, alpha=1.4, beta=6.0)
    oo, _ = oracle.nsm_ed(data, q, 2.0, alpha=1.4, beta=6.0)
    assert set(res.offsets.tolist()) == set(oo.tolist())


def test_twin_rsm_dtw_matches_oracle(setup):
    data, icfg, index = setup
    eng = ScalarTwinDtw(data, index=index, icfg=icfg)
    q = data[22000:22000 + 256]
    res = eng.query(q, 4.0, rho=12)
    oo, od = oracle.rsm_dtw(data, q, 4.0, 12)
    assert set(res.offsets.tolist()) == set(oo.tolist())
    got = dict(zip(res.offsets.tolist(), res.distances.tolist()))
    ref = dict(zip(oo.tolist(), od.tolist()))
    for k in ref:
        assert got[k] == pytest.approx(ref[k], rel=1e-9)


def test_twin_cnsm_dtw_matches_oracle(setup):
    data, icfg, index = setup
    eng = ScalarTwinNormDtw(data, index=index, icfg=icfg)
    q = data[41000:41000 + 256]
    res = eng.query(q, 2.0, rho=12, alpha=1.4, beta=6.0)
    oo, _ = oracle.cnsm_dtw(data, q, 2.0, rho=12, alpha=1.4, beta=6.0)
    assert set(res.offsets.tolist()) == set(oo.tolist())
