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


def test_gate_fails_closed_on_nan():
    # ADVICE r3 medium #1: `err > gate` is False for NaN, so the old
    # formulation let a totally broken run (NaN mean/LML) ship through the
    # gate. NaN in ANY position must now fail.
    b = _bench()
    nan = float("nan")
    for mean_err, lml_err in [(nan, 1e-6), (1e-5, nan), (nan, nan)]:
        with pytest.raises(SystemExit):
            b.check_parity_gate(mean_err, lml_err)
    with pytest.raises(SystemExit):
        b.check_parity_gate(1e-5, 1e-6, var_err=nan)


def test_gate_fails_on_var_alone():
    # ADVICE r3 low #4: variance is the one reduced-precision quantity
    # (HIGH v solve) — it needs its own gate.
    b = _bench()
    b.check_parity_gate(1e-5, 1e-6, var_err=1e-4)  # passes
    with pytest.raises(SystemExit):
        b.check_parity_gate(1e-5, 1e-6, var_err=5e-2)


def test_committed_reference_lookup():
    # the contention defense reads the newest committed BENCH_ALL row
    b = _bench()
    ref = b._committed_reference_ms("exact_gp_regression_solve_n8192")
    assert ref is not None and 1.0 < ref < 100.0
    assert b._committed_reference_ms("no_such_metric_xyz") is None
