"""Stats export + cost-model fit smoke tests."""

import numpy as np

from kvmatch_tpu.config import IndexConfig
from kvmatch_tpu.data.generators import generate_series
from kvmatch_tpu.engine.rsm_ed import QueryEngine
from kvmatch_tpu.index.build import build_index_numpy
from kvmatch_tpu.utils.profiling import StatsWriter, fit_cost_model


def test_stats_writer(tmp_path):
    data = generate_series(20_000, seed=2)
    engine = QueryEngine(data, index=build_index_numpy(data, IndexConfig()))
    res = engine.query_at(500, 256, 4.0)
    w = StatsWriter(tmp_path / "stats.csv")
    w.write("q1", res.stats)
    w.write("q2", res.stats)
    lines = (tmp_path / "stats.csv").read_text().strip().splitlines()
    assert lines[0].startswith("label,t_total_ms")
    assert len(lines) == 3 and lines[1].startswith("q1,")


def test_fit_cost_model_runs(tmp_path):
    data = generate_series(20_000, seed=2)
    engine = QueryEngine(data, index=build_index_numpy(data, IndexConfig()))
    offs = [300, 5000, 11000]
    queries = np.stack([data[o:o + 256] for o in offs])
    qcfg = fit_cost_model(engine, queries, 4.0)
    assert qcfg.phase2_cost_a >= 0 and qcfg.phase2_cost_b >= 0


def test_fit_cost_model_routes_by_engine_family():
    """ED engines re-fit (a, b, intercept); DTW/Norm engines re-fit the _dtw
    coefficients (the reference fits the two families separately,
    QueryEngine.java:55-57 vs QueryEngineDtw.java:53-55)."""
    import numpy as np
    from kvmatch_tpu.config import IndexConfig
    from kvmatch_tpu.data.generators import generate_series
    from kvmatch_tpu.engine.norm_ed import NormQueryEngine
    from kvmatch_tpu.engine.rsm_ed import QueryEngine
    from kvmatch_tpu.index.build import build_index_numpy
    from kvmatch_tpu.utils.profiling import fit_cost_model

    data = generate_series(40_000, seed=21)
    icfg = IndexConfig()
    index = build_index_numpy(data, icfg)
    rng = np.random.default_rng(0)
    offs = rng.integers(0, data.size - 512, 6)
    queries = np.stack([data[o:o + 512] for o in offs])

    eng = QueryEngine(data, index=index, icfg=icfg)
    qc = fit_cost_model(eng, queries, 6.0)
    assert qc.phase2_cost_a_dtw == eng.qcfg.phase2_cost_a_dtw  # untouched

    neng = NormQueryEngine(data, index=index, icfg=icfg)
    qc2 = fit_cost_model(neng, queries, 3.0, alpha=1.3, beta=8.0)
    assert qc2.phase2_cost_a == neng.qcfg.phase2_cost_a        # untouched
    assert qc2.phase2_cost_intercept >= 0.0
