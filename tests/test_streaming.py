"""Incremental index maintenance: append == from-scratch rebuild, exactly."""

import numpy as np
import pytest

from kvmatch_tpu.config import IndexConfig
from kvmatch_tpu.data.generators import generate_series
from kvmatch_tpu.index.build import build_index_numpy
from kvmatch_tpu.index.streaming import StreamingIndexBuilder

FIELDS = ("keys", "row_ptr", "left", "right", "cum_intervals", "cum_offsets")


def _assert_same(a, b):
    assert set(a) == set(b)
    for w in a:
        for f in FIELDS:
            assert np.array_equal(getattr(a[w], f), getattr(b[w], f)), (w, f)
        assert a[w].n == b[w].n


@pytest.mark.parametrize("chunks", [
    [30_000],                       # single shot == plain build
    [10_000, 10_000, 10_000],       # equal chunks
    [29_000, 17, 400, 583],         # tiny appends below/around w_max
    [123, 456, 29_421],             # starts below the largest scale
])
def test_streaming_matches_from_scratch(chunks):
    icfg = IndexConfig()
    data = generate_series(sum(chunks), seed=31)
    b = StreamingIndexBuilder(icfg)
    pos = 0
    for c in chunks:
        b.append(data[pos:pos + c])
        pos += c
    _assert_same(b.build(), build_index_numpy(data, icfg))


def test_streaming_refresh_then_extend():
    """build() mid-stream, keep appending, build() again: second build is
    still identical to from-scratch (caches stay consistent across builds)."""
    icfg = IndexConfig()
    data = generate_series(45_000, seed=32)
    b = StreamingIndexBuilder(icfg)
    b.append(data[:20_000])
    mid = b.build()
    _assert_same(mid, build_index_numpy(data[:20_000], icfg))
    b.append(data[20_000:])
    _assert_same(b.build(), build_index_numpy(data, icfg))


def test_streaming_constant_run_spanning_appends():
    """A constant region crossing many append boundaries must keep the same
    cap-split phase as a from-scratch RLE."""
    icfg = IndexConfig()
    data = generate_series(8_000, seed=33)
    data[2_000:6_500] = 1.0       # constant run >> cap, crosses chunk bounds
    b = StreamingIndexBuilder(icfg)
    for s in range(0, 8_000, 1_000):
        b.append(data[s:s + 1_000])
    _assert_same(b.build(), build_index_numpy(data, icfg))


def test_streaming_queries_exact():
    """End-to-end: query engine on a streamed index == oracle."""
    from kvmatch_tpu import oracle
    from kvmatch_tpu.engine.rsm_ed import QueryEngine

    icfg = IndexConfig()
    data = generate_series(40_000, seed=34)
    b = StreamingIndexBuilder(icfg)
    for s in range(0, 40_000, 7_000):
        b.append(data[s:s + 7_000])
    eng = QueryEngine(data, index=b.build(), icfg=icfg)
    q = data[11_000:11_512]
    res = eng.query(q, 5.0)
    oo, _ = oracle.rsm_ed(data, q, 5.0)
    assert set(res.offsets.tolist()) == set(oo.tolist())
