"""Workload generation + replay drivers."""

from kvmatch_tpu import NormQueryEngine, QueryEngine
from kvmatch_tpu.config import IndexConfig
from kvmatch_tpu.data.generators import generate_series
from kvmatch_tpu.experiments import (generate_workload, load_workload,
                                     run_workload, save_workload)
from kvmatch_tpu.index.build import build_index_numpy


def test_workload_roundtrip_and_replay(tmp_path):
    data = generate_series(25_000, seed=31)
    engine = QueryEngine(data, index=build_index_numpy(data, IndexConfig()))
    wl = generate_workload(engine, lengths=[128, 256], epsilons=[2.0, 6.0],
                           queries_per_cell=2, seed=1)
    assert wl, "sweep should find selective queries"
    save_workload(wl, tmp_path / "wl.json")
    wl2 = load_workload(tmp_path / "wl.json")
    assert [e.offset for e in wl] == [e.offset for e in wl2]
    reports = run_workload(engine, wl2)
    assert reports
    assert sum(r.false_dismissals for r in reports) == 0
    assert all(r.mean_answers >= 1 for r in reports)


def test_workload_norm_params(tmp_path):
    data = generate_series(25_000, seed=32)
    engine = NormQueryEngine(data, index=build_index_numpy(data, IndexConfig()))
    wl = generate_workload(engine, lengths=[128], epsilons=[3.0],
                           queries_per_cell=2, seed=2,
                           param_grid=[{"alpha": 1.3, "beta": 10.0}])
    reports = run_workload(engine, wl)
    assert sum(r.false_dismissals for r in reports) == 0
