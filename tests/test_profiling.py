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
