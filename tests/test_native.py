"""Native C interval kernels vs the NumPy path: identical candidate sets."""

import numpy as np
import pytest

from kvmatch_tpu import native
from kvmatch_tpu.config import IndexConfig
from kvmatch_tpu.data.generators import generate_series
from kvmatch_tpu.engine.norm_ed import NormQueryEngine
from kvmatch_tpu.engine.rsm_ed import QueryEngine
from kvmatch_tpu.index.build import build_index_numpy

N = 40_000


@pytest.fixture(scope="module")
def setup():
    data = generate_series(N, seed=41)
    index = build_index_numpy(data, IndexConfig())
    return data, index


def _answers(engine, data, off, L, eps, **params):
    res = engine.query_at(off, L, eps, **params)
    return set(res.offsets.tolist()), res.stats.n_candidates


def test_native_lib_builds():
    assert native.get_lib() is not None, "C kernel compilation failed"


def test_rsm_native_matches_numpy(setup, monkeypatch):
    data, index = setup
    eng = QueryEngine(data, index=index)
    cases = [(1000, 512, 5.0), (22000, 1024, 12.0), (9000, 256, 2.0)]
    with_native = [_answers(eng, data, *c) for c in cases]
    monkeypatch.setattr(native, "get_lib", lambda: None)
    without = [_answers(eng, data, *c) for c in cases]
    assert with_native == without


def test_norm_native_matches_numpy(setup, monkeypatch):
    data, index = setup
    eng = NormQueryEngine(data, index=index)
    cases = [(2000, 512, 3.0), (15000, 1024, 5.0)]
    kw = dict(alpha=1.3, beta=10.0)
    with_native = [_answers(eng, data, *c, **kw) for c in cases]
    monkeypatch.setattr(native, "get_lib", lambda: None)
    without = [_answers(eng, data, *c, **kw) for c in cases]
    # answer sets must be identical; candidate counts may differ slightly only
    # if filters fire in different float orders — require equality here too.
    assert with_native == without


def test_intersect_ed_unit():
    lib = native.get_lib()
    assert lib is not None
    cs = {"left": np.array([0, 10, 30], np.int64),
          "right": np.array([5, 20, 35], np.int64),
          "eps": np.array([1.0, 2.0, 3.0])}
    raw = {"left": np.array([3, 18, 36], np.int64),
           "right": np.array([12, 32, 40], np.int64),
           "eps": np.array([0.5, 0.5, 0.5])}
    out, n_off, emin = native.intersect_ed(cs, raw, eps2=100.0)
    # pieces: [3,5](1.5), [10,12](2.5), [18,20](2.5), [30,32](3.5)
    np.testing.assert_array_equal(out["left"], [3, 10, 18, 30])
    np.testing.assert_array_equal(out["right"], [5, 12, 20, 32])
    np.testing.assert_allclose(out["eps"], [1.5, 2.5, 2.5, 3.5])
    assert n_off == 3 + 3 + 3 + 3 and emin == 1.5
    # budget filter
    out, n_off, emin = native.intersect_ed(cs, raw, eps2=2.0)
    np.testing.assert_array_equal(out["left"], [3])
    # frame shift folded into the kernel
    out, _, _ = native.intersect_ed(cs, raw, eps2=100.0, delta=7)
    np.testing.assert_array_equal(out["left"], [10, 17, 25, 37])


def test_bucket_pass_matches_numpy():
    """Fused C bucket pass == rounding.bucket_id on the same f64 prefix sums,
    including negative means and the half-cell boundary."""
    import numpy as np
    from kvmatch_tpu import native
    from kvmatch_tpu.utils import rounding

    rng = np.random.default_rng(7)
    data = np.cumsum(rng.standard_normal(50_000)) * 0.3 - 5.0
    # exact half-cell values exercise the >= 0.5 tie rule
    data[100:200] = 1.25
    c1 = np.concatenate(([0.0], np.cumsum(data)))
    for w in (25, 50, 400):
        got = native.bucket_pass(c1, w, 2)
        if got is None:
            import pytest
            pytest.skip("native unavailable")
        ref = rounding.bucket_id((c1[w:] - c1[:-w]) / w, 2).astype(np.int32)
        assert np.array_equal(got, ref)


def test_host_and_device_builds_answer_identically(setup):
    """The host-C and device bucket passes may bucket a window differently at
    f32/f64 cell edges (both indexes are valid — each is self-consistent and
    the probe guard covers the edge slack); the contract is equal ANSWERS."""
    from kvmatch_tpu.index.build import build_index_numpy, build_index_tpu
    data, _ = setup
    ih = build_index_numpy(data)
    idv = build_index_tpu(data)
    eh = QueryEngine(data, index=ih, icfg=IndexConfig())
    ed = QueryEngine(data, index=idv, icfg=IndexConfig())
    for off, L, eps in [(5000, 256, 4.0), (20000, 1024, 9.0)]:
        ah, _ = _answers(eh, data, off, L, eps)
        ad, _ = _answers(ed, data, off, L, eps)
        assert ah == ad and off in ah


def test_build_native_matches_numpy(monkeypatch):
    """C rle_cap + group_merge produce a bit-identical index to the NumPy
    grouping path, including adversarial bucket patterns (long runs over the
    255-cap, alternating singletons, constant regions)."""
    from kvmatch_tpu.index import build as B

    rng = np.random.default_rng(3)
    data = np.cumsum(rng.standard_normal(120_000)) * 0.25
    data[10_000:12_000] = 3.0          # constant run >> cap
    data[50_000:50_400] = np.repeat([0.0, 0.7], 200)  # sharp alternation
    icfg = IndexConfig()
    a = B.build_index_numpy(data, icfg)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    b = B.build_index_numpy(data, icfg)
    for w in a:
        for f in ("keys", "row_ptr", "left", "right",
                  "cum_intervals", "cum_offsets"):
            assert np.array_equal(getattr(a[w], f), getattr(b[w], f)), (w, f)
        assert a[w].mean_upper_bound == b[w].mean_upper_bound


def test_rle_cap_unit():
    """C RLE against hand-computed runs incl. an exact multiple of the cap."""
    if native.get_lib() is None:
        pytest.skip("native unavailable")
    b = np.array([5] * 600 + [7] * 255 + [5] + [9] * 2, np.int32)
    ob, ol, orr = native.rle_cap(b, 255)
    # 600 = 255 + 255 + 90; then 255; then 1; then 2
    assert ob.tolist() == [5, 5, 5, 7, 5, 9]
    assert ol.tolist() == [0, 255, 510, 600, 855, 856]
    assert orr.tolist() == [254, 509, 599, 854, 855, 857]


def test_group_rows_unit():
    """Counting-sort grouping equals the argsort reference: ascending unique
    buckets, row CSR offsets, and position-ordered intervals per row —
    including negative bucket ids."""
    if native.get_lib() is None:
        pytest.skip("native unavailable")
    rng = np.random.default_rng(11)
    b = rng.integers(-40, 40, 5000).astype(np.int32)
    l = np.sort(rng.choice(10_000_000, 5000, replace=False)).astype(np.int64)
    r = l + rng.integers(0, 200, 5000)
    got = native.group_rows(b, l, r)
    assert got is not None
    ub, row_ptr, gl, gr = got
    order = np.argsort(b, kind="stable")
    ub_ref, starts = np.unique(b[order], return_index=True)
    assert np.array_equal(ub, ub_ref.astype(np.int64))
    assert np.array_equal(row_ptr[:-1], starts)
    assert row_ptr[-1] == b.size
    assert np.array_equal(gl, l[order])
    assert np.array_equal(gr, r[order])


def test_group_merge_ascending_order():
    """group_merge emits rows ascending by key with intra-row interval order
    preserved (the C kernel writes from the buffer end)."""
    if native.get_lib() is None:
        pytest.skip("native unavailable")
    # Three rows; the middle one is tiny and should merge into the scan group
    # when the union shrinks enough.
    row_start = np.array([0, 3, 4], np.int64)
    row_end = np.array([3, 4, 7], np.int64)
    ub = np.array([10, 11, 12], np.int64)
    l = np.array([0, 100, 200,  5,  0, 50, 300], np.int64)
    r = np.array([9, 109, 209, 14, 9, 59, 309], np.int64)
    keys, counts, ol, orr = native.group_merge(
        row_start, row_end, ub, l, r, merge_thresh=2.0, shrink_factor=0.99,
        cap=256)
    assert np.all(np.diff(keys) > 0)          # ascending
    assert int(counts.sum()) == ol.size == orr.size
    # row 11 (single interval [5,14]) merges into row 12's group -> keeps key 11
    assert 10 in keys and (11 in keys or 12 in keys)


def test_merge_rows_unit():
    """K-way merge equals the argsort reference on random disjoint rows."""
    if native.get_lib() is None:
        pytest.skip("native unavailable")
    rng = np.random.default_rng(5)
    # Build 7 rows of disjoint position-sorted intervals from a global pool.
    pool_l = np.sort(rng.choice(1_000_000, 4000, replace=False)).astype(np.int64) * 300
    pool_r = pool_l + rng.integers(0, 256, pool_l.size)
    owner = rng.integers(0, 7, pool_l.size)
    row_start, row_end, flat_l, flat_r = [], [], [], []
    p = 0
    for row in range(7):
        sel = owner == row
        row_start.append(p)
        flat_l.append(pool_l[sel])
        flat_r.append(pool_r[sel])
        p += int(sel.sum())
        row_end.append(p)
    flat_l = np.concatenate(flat_l)
    flat_r = np.concatenate(flat_r)
    got = native.merge_rows(np.array(row_start, np.int64),
                            np.array(row_end, np.int64), flat_l, flat_r)
    assert got is not None
    grow, gl, gr = got
    order = np.argsort(flat_l, kind="stable")
    assert np.array_equal(gl, flat_l[order])
    assert np.array_equal(gr, flat_r[order])
    rep = np.repeat(np.arange(7), np.diff([0] + row_end) if False else
                    (np.array(row_end) - np.array(row_start)))
    assert np.array_equal(grow, rep[order])


def test_join_path_matches_scan_intersect():
    """Forcing the fused join for every post-first segment yields the same
    answers and candidate intervals as the scan+intersect path."""
    if native.get_lib() is None:
        pytest.skip("native unavailable")
    from kvmatch_tpu.engine.rsm_ed import QueryEngine
    from kvmatch_tpu.engine.rsm_dtw import QueryEngineDtw
    from kvmatch_tpu.index.build import build_index_numpy

    rng = np.random.default_rng(9)
    data = np.cumsum(rng.standard_normal(60_000)) * 0.3
    idx = build_index_numpy(data)
    for cls, params in ((QueryEngine, {}), (QueryEngineDtw, {"rho": 12})):
        eng = cls(data, index=idx, icfg=IndexConfig())
        for off, L, eps in [(1234, 512, 6.0), (30000, 1024, 10.0),
                            (5555, 256, 3.0)]:
            q = data[off:off + L]
            eng.JOIN_CS_RATIO = 10**18     # 'cs*ratio < count' never true: scan+intersect
            base_res = eng.query(q, eps, **params)
            eng.JOIN_CS_RATIO = 0          # '0 < count' whenever count > 0: join forced
            eng.POS_VIEW_MIN = 0           # allow the pos-sorted view on tiny fixtures
            join_res = eng.query(q, eps, **params)
            assert set(base_res.offsets.tolist()) == set(join_res.offsets.tolist())
            assert off in join_res.offsets.tolist()
        eng.JOIN_CS_RATIO = type(eng).JOIN_CS_RATIO


def test_join_norm_path_matches_scan_intersect():
    """Forcing the fused cNSM join yields the same answers as scan+intersect."""
    if native.get_lib() is None:
        pytest.skip("native unavailable")
    from kvmatch_tpu.engine.norm_ed import NormQueryEngine
    from kvmatch_tpu.engine.norm_dtw import NormQueryEngineDtw
    from kvmatch_tpu.index.build import build_index_numpy

    rng = np.random.default_rng(13)
    data = np.cumsum(rng.standard_normal(60_000)) * 0.3
    idx = build_index_numpy(data)
    for cls, params in ((NormQueryEngine, {}),
                        (NormQueryEngineDtw, {"rho": 12})):
        eng = cls(data, index=idx, icfg=IndexConfig())
        for off, L, eps in [(1234, 512, 4.0), (30000, 1024, 6.0)]:
            q = data[off:off + L]
            eng.JOIN_CS_RATIO = 10**18     # scan+intersect
            base_res = eng.query(q, eps, alpha=1.3, beta=8.0, **params)
            eng.JOIN_CS_RATIO = 0          # join forced
            eng.POS_VIEW_MIN = 0           # allow the pos-sorted view on tiny fixtures
            join_res = eng.query(q, eps, alpha=1.3, beta=8.0, **params)
            assert set(base_res.offsets.tolist()) == set(join_res.offsets.tolist())
            assert off in join_res.offsets.tolist()
        eng.JOIN_CS_RATIO = type(eng).JOIN_CS_RATIO


def test_install_pieces_matches_fallback():
    """The fused int32 piece install (widen + counting scatter) must produce
    the same pos-sorted and row-CSR arrays as the int64 fallback path."""
    if native.get_lib() is None:
        pytest.skip("native unavailable")
    from kvmatch_tpu.index.structure import IndexScale

    rng = np.random.default_rng(7)
    R = 37
    counts = rng.integers(0, 50, R)
    row = np.repeat(np.arange(R, dtype=np.int64), counts)
    n = row.size
    left = np.sort(rng.integers(0, 10_000, n)).astype(np.int64)
    right = left + rng.integers(0, 256, n)

    def make_scale():
        row_ptr = np.zeros(R + 1, np.int64)
        np.cumsum(counts, out=row_ptr[1:])
        return IndexScale(w=25, n=10_500, keys=np.arange(R, dtype=np.float64),
                          row_ptr=row_ptr, left=None, right=None,
                          cum_intervals=np.cumsum(counts),
                          cum_offsets=np.cumsum(counts))

    sa, sb = make_scale(), make_scale()
    sa.set_pos_arrays(left.astype(np.int32), right.astype(np.int32),
                      row.astype(np.int32))        # fused C pass
    sb.set_pos_arrays(left, right, row)            # int64 fallback
    for x, y in zip(sa.pos_sorted(), sb.pos_sorted()):
        np.testing.assert_array_equal(x, y)
    np.testing.assert_array_equal(sa.left, sb.left)
    np.testing.assert_array_equal(sa.right, sb.right)
