"""The bench parity gate must GATE (VERDICT r2 weak #2: round 2's 'gate'
only logged, which is exactly how an 85x parity regression shipped
silently). A deliberately degraded error pair must fail the run with a
nonzero exit; round-1-level parity must pass."""

import pytest


def _bench():
    import bench

    return bench


def test_gate_passes_at_round1_levels():
    b = _bench()
    # round-1 measured parity (BENCH_r01.json): mean 3.46e-4, lml 3.21e-5
    b.check_parity_gate(3.46e-4, 3.21e-5)


def test_gate_fails_on_round2_regression_levels():
    b = _bench()
    # round-2 regression (BENCH_r02.json): mean 1.56e-3, lml 2.74e-3 —
    # the exact failure the gate exists to catch, and it must exit nonzero
    with pytest.raises(SystemExit) as e:
        b.check_parity_gate(1.56e-3, 2.74e-3)
    assert e.value.code == 1


def test_gate_fails_on_lml_alone():
    b = _bench()
    with pytest.raises(SystemExit):
        b.check_parity_gate(1e-5, 5e-4)


def test_gate_fails_on_mean_alone():
    b = _bench()
    with pytest.raises(SystemExit):
        b.check_parity_gate(5e-3, 1e-6)
