"""Full-scan UCR baselines vs the float64 oracle."""

import pytest

from kvmatch_tpu import oracle
from kvmatch_tpu.baselines import ScanStats, UcrScanner
from kvmatch_tpu.data.generators import generate_series

N = 30_000


@pytest.fixture(scope="module")
def setup():
    data = generate_series(N, seed=23)
    return data, UcrScanner(data)


def test_scan_ed_matches_oracle(setup):
    data, scanner = setup
    for off, L, eps in [(1000, 256, 4.0), (12000, 777, 10.0)]:
        q = data[off:off + L]
        st = ScanStats()
        oo_s, od_s = scanner.scan_ed(q, eps, stats=st)
        oo, od = oracle.rsm_ed(data, q, eps)
        assert set(oo_s.tolist()) == set(oo.tolist())
        assert st.n_windows == N - L + 1
        assert off in oo_s.tolist()


def test_scan_nsm_and_cnsm_ed(setup):
    data, scanner = setup
    off, L, eps = 5000, 512, 5.0
    q = data[off:off + L]
    # unconstrained NSM
    oo_s, _ = scanner.scan_nsm_ed(q, eps)
    oo, _ = oracle.nsm_ed(data, q, eps)
    assert set(oo_s.tolist()) == set(oo.tolist())
    # constrained
    oo_s, _ = scanner.scan_nsm_ed(q, eps, alpha=1.3, beta=8.0)
    oo, _ = oracle.nsm_ed(data, q, eps, alpha=1.3, beta=8.0)
    assert set(oo_s.tolist()) == set(oo.tolist())


def test_scan_dtw_matches_oracle(setup):
    data, scanner = setup
    off, L, eps, rho = 9000, 128, 2.5, 6
    q = data[off:off + L]
    st = ScanStats()
    oo_s, _ = scanner.scan_dtw(q, eps, rho, stats=st)
    oo, _ = oracle.rsm_dtw(data, q, eps, rho)
    assert set(oo_s.tolist()) == set(oo.tolist())
    # The PAA prefilter must have pruned most windows but kept all answers.
    assert st.n_after_paa < st.n_windows
    assert st.n_answers == oo.size


def test_paa_prefilter_is_sound(setup):
    """Disabling the PAA prefilter must not change the answer set."""
    data, scanner = setup
    off, L, eps, rho = 21000, 128, 3.0, 6
    q = data[off:off + L]
    a1, _ = scanner.scan_dtw(q, eps, rho, paa_prefilter=True)
    a2, _ = scanner.scan_dtw(q, eps, rho, paa_prefilter=False)
    assert set(a1.tolist()) == set(a2.tolist())
