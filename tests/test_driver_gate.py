"""In-suite mirror of the driver's 50-entry correctness gate at
sf0.001 — an entry or oracle regression fails ``pytest`` before the
driver ever sees it (VERDICT r4 task 7). Uses the session Ray fixture;
the heavier sf0.01 sweep stays a manual ``tools/driver_mirror.py``
run."""

import pytest


@pytest.mark.driver_gate
def test_driver_gate_all_entries_sf0001(ray_session):
    from tools.driver_mirror import run_gate

    report, n_green, n_rowsonly, n_fail = run_gate(
        "/root/testdata/sf0.001", verbose=False)
    bad = {k: v["err"] for k, v in report.items()
           if v["err"] is not None or v["hash_match"] is False}
    assert n_fail == 0, bad
    # every entry carries an oracle now (r5): rows-only means a lost
    # oracle_sql() registration, which the driver would score weaker
    assert n_rowsonly == 0, {k: v for k, v in report.items()
                             if v["hash_match"] is None}
    assert n_green == len(report) == 50
