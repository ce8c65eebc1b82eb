"""Codec + store round-trip tests (index build -> serialize -> probe)."""

import numpy as np
import pytest

from kvmatch_tpu.config import IndexConfig
from kvmatch_tpu.data.generators import generate_series
from kvmatch_tpu.index.build import build_index_numpy
from kvmatch_tpu.storage.file import IndexFileStore, IndexNpzStore, TimeSeriesFileStore
from kvmatch_tpu.utils import codec


def test_compact_positions_roundtrip():
    rng = np.random.default_rng(0)
    for trial in range(20):
        k = int(rng.integers(1, 400))
        widths = rng.integers(0, 255, k)
        gaps = rng.integers(1, 255, k)
        left = np.cumsum(gaps) + np.concatenate(([0], np.cumsum(widths)[:-1]))
        right = left + widths
        blob = codec.encode_positions_compact(left, right)
        l2, r2 = codec.decode_positions_compact(blob)
        np.testing.assert_array_equal(left, l2)
        np.testing.assert_array_equal(right, r2)


def test_compact_positions_large_gaps():
    left = np.array([0, 1000, 1300, 99999], np.int64)
    right = np.array([10, 1010, 1350, 100100], np.int64)
    blob = codec.encode_positions_compact(left, right)
    l2, r2 = codec.decode_positions_compact(blob)
    np.testing.assert_array_equal(left, l2)
    np.testing.assert_array_equal(right, r2)


def test_statistic_info_roundtrip():
    keys = np.array([-3.5, 0.0, 1.05, 8.4])
    ci = np.array([3, 10, 11, 40])
    co = np.array([30, 100, 111, 400])
    k2, i2, o2 = codec.decode_statistic_info(codec.encode_statistic_info(keys, ci, co))
    np.testing.assert_array_equal(keys, k2)
    np.testing.assert_array_equal(ci, i2)
    np.testing.assert_array_equal(co, o2)


@pytest.fixture(scope="module")
def index_and_data(tmp_path_factory):
    data = generate_series(30_000, seed=1)
    icfg = IndexConfig()
    return data, build_index_numpy(data, icfg), tmp_path_factory.mktemp("store")


def _assert_index_equal(a, b, check_upper=True):
    assert set(a) == set(b)
    for w in a:
        np.testing.assert_array_equal(a[w].keys, b[w].keys)
        np.testing.assert_array_equal(a[w].row_ptr, b[w].row_ptr)
        np.testing.assert_array_equal(a[w].left, b[w].left)
        np.testing.assert_array_equal(a[w].right, b[w].right)
        np.testing.assert_array_equal(a[w].cum_intervals, b[w].cum_intervals)
        np.testing.assert_array_equal(a[w].cum_offsets, b[w].cum_offsets)


def test_index_file_roundtrip(index_and_data):
    data, index, tmp = index_and_data
    store = IndexFileStore(tmp / "idx", n=data.size)
    store.save(index)
    loaded = store.load()
    _assert_index_equal(index, loaded)


def test_index_npz_roundtrip(index_and_data):
    data, index, tmp = index_and_data
    store = IndexNpzStore(tmp / "idx.npz")
    store.save(index)
    loaded = store.load()
    _assert_index_equal(index, loaded)
    assert loaded[25].mean_upper_bound == index[25].mean_upper_bound


def test_timeseries_file_roundtrip(index_and_data):
    data, _, tmp = index_and_data
    TimeSeriesFileStore.write(tmp / "data-30000", data)
    store = TimeSeriesFileStore(tmp / "data-30000")
    assert store.length() == data.size
    np.testing.assert_array_equal(store.read(1234, 777), data[1234:1234 + 777])
    # raw file is big-endian doubles (reference data file layout)
    raw = np.fromfile(tmp / "data-30000", dtype=">f8")
    np.testing.assert_array_equal(raw, data)


def test_query_from_loaded_index(index_and_data):
    data, index, tmp = index_and_data
    from kvmatch_tpu.engine.rsm_ed import QueryEngine
    store = IndexNpzStore(tmp / "idx2.npz")
    store.save(index)
    engine = QueryEngine(data, index=store.load())
    res = engine.query_at(2000, 400, 5.0)
    assert res.found and res.best()[0] == 2000


def test_compact_positions_int64_long_variant():
    """pos_bytes=8: the LongIndexNode codec for positions beyond 2**31."""
    base = 3_000_000_000  # > int32
    left = base + np.array([0, 300, 700, 100_000], np.int64)
    right = left + np.array([10, 100, 255, 0], np.int64)
    blob = codec.encode_positions_compact(left, right, pos_bytes=8)
    l2, r2 = codec.decode_positions_compact(blob, pos_bytes=8)
    np.testing.assert_array_equal(left, l2)
    np.testing.assert_array_equal(right, r2)
