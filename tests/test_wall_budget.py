"""Unit tests for the wall-budget guard's measurement parsing and the
r12 host-canary normalization — the logic that decides whether a wall
flag means "the code got slower" or "the host got slower" must not
itself regress silently (r12 measured +34.7% wall on IDENTICAL code
across two boots; the canary is what keeps that from reading as a
plan regression). r13 hardened the guard per ADVICE: each metric is
normalized by its OWN epoch's canary (suite walls carry their own,
the bench sidecar its own), and when a canary pair exists the
normalized growth is the SOLE effective metric — never OR-ed with
raw, so a faster host cannot mask a real regression."""

from __future__ import annotations

import importlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

wall_budget = importlib.import_module("wall_budget")


def _write_jsonl(path, records):
    with open(path, "w") as fh:
        for r in records:
            fh.write(json.dumps(r) + "\n")


def test_suite_measurement_filters_tiny_chunks(tmp_path, monkeypatch):
    walls = tmp_path / "walls.jsonl"
    _write_jsonl(
        walls,
        [
            # a tiny -k run: must be ignored (amortizes startup badly)
            {"ts": 1, "n_tests": 5, "wall_s": 50.0, "exit": 0},
            # a failed chunk: must be ignored
            {"ts": 2, "n_tests": 300, "wall_s": 600.0, "exit": 1},
            # two real chunks, newest first by ts
            {"ts": 4, "n_tests": 200, "wall_s": 400.0, "exit": 0},
            {"ts": 3, "n_tests": 200, "wall_s": 200.0, "exit": 0},
        ],
    )
    monkeypatch.setattr(wall_budget, "WALLS", str(walls))
    sec_per_test, covered, canary = wall_budget.measure_suite_sec_per_test()
    # (400 + 200) / (200 + 200) — the tiny and failed records excluded
    assert covered == 400
    assert sec_per_test == 1.5
    assert canary is None  # pre-r13 records carry no canary


def test_suite_measurement_requires_coverage(tmp_path, monkeypatch):
    walls = tmp_path / "walls.jsonl"
    _write_jsonl(walls, [{"ts": 1, "n_tests": 60, "wall_s": 60.0, "exit": 0}])
    monkeypatch.setattr(wall_budget, "WALLS", str(walls))
    assert wall_budget.measure_suite_sec_per_test() is None


def test_suite_canary_is_wall_weighted(tmp_path, monkeypatch):
    walls = tmp_path / "walls.jsonl"
    _write_jsonl(
        walls,
        [
            {"ts": 4, "n_tests": 200, "wall_s": 300.0, "exit": 0,
             "canary_s": 0.2},
            {"ts": 3, "n_tests": 200, "wall_s": 100.0, "exit": 0,
             "canary_s": 0.4},
        ],
    )
    monkeypatch.setattr(wall_budget, "WALLS", str(walls))
    _, _, canary = wall_budget.measure_suite_sec_per_test()
    # (0.2*300 + 0.4*100) / 400 = 0.25
    assert canary == 0.25


def _run_guard(tmp_path, monkeypatch, budget, sidecar, walls_records):
    budget_p = tmp_path / "wall_budget.json"
    budget_p.write_text(json.dumps(budget))
    side_p = tmp_path / "bench_structure.json"
    side_p.write_text(json.dumps(sidecar))
    walls_p = tmp_path / "walls.jsonl"
    _write_jsonl(walls_p, walls_records)
    monkeypatch.setattr(wall_budget, "BUDGET", str(budget_p))
    monkeypatch.setattr(wall_budget, "BENCH_SIDE", str(side_p))
    monkeypatch.setattr(wall_budget, "WALLS", str(walls_p))
    monkeypatch.setattr(sys, "argv", ["wall_budget.py"])
    return wall_budget.main()


_OK_WALLS = [
    {"ts": 3, "n_tests": 300, "wall_s": 300.0, "exit": 0},
]


def test_raw_growth_past_20pct_flags_without_canary(tmp_path, monkeypatch):
    rc = _run_guard(
        tmp_path,
        monkeypatch,
        budget={"suite_sec_per_test": 1.0, "bench_wall_sec": 300.0},
        sidecar={"bench_wall_sec": 400.0},  # +33% raw, no canary anywhere
        walls_records=_OK_WALLS,
    )
    assert rc == 1


def test_host_drift_clears_the_flag(tmp_path, monkeypatch):
    # +33% raw wall growth, but the canary says the host is 1.4x
    # slower — normalized growth is negative; the guard must pass.
    # Uses the legacy shared-canary budget key (pre-r13 budgets remain
    # valid as the BENCH reference).
    rc = _run_guard(
        tmp_path,
        monkeypatch,
        budget={
            "suite_sec_per_test": 1.0,
            "bench_wall_sec": 300.0,
            "machine_canary_sec": 0.25,
        },
        sidecar={"bench_wall_sec": 400.0, "machine_canary_sec": 0.35},
        walls_records=_OK_WALLS,
    )
    assert rc == 0


def test_code_regression_survives_normalization(tmp_path, monkeypatch):
    # Same-speed host (canary flat) + +33% wall: a REAL regression —
    # normalization must not absolve it.
    rc = _run_guard(
        tmp_path,
        monkeypatch,
        budget={
            "suite_sec_per_test": 1.0,
            "bench_wall_sec": 300.0,
            "machine_canary_sec": 0.25,
        },
        sidecar={"bench_wall_sec": 400.0, "machine_canary_sec": 0.25},
        walls_records=_OK_WALLS,
    )
    assert rc == 1


def test_faster_host_cannot_mask_regression(tmp_path, monkeypatch):
    # r12 ADVICE: raw growth +12% (within 20) but the host got 1.6x
    # FASTER (canary 0.25 -> 0.156), so normalized growth is +79% — a
    # real regression the old OR-semantics would have passed. The
    # normalized metric must be the sole effective one and FLAG.
    rc = _run_guard(
        tmp_path,
        monkeypatch,
        budget={
            "suite_sec_per_test": 1.0,
            "bench_wall_sec": 300.0,
            "machine_canary_sec": 0.25,
        },
        sidecar={"bench_wall_sec": 336.0, "machine_canary_sec": 0.156},
        walls_records=_OK_WALLS,
    )
    assert rc == 1


def test_suite_metric_uses_its_own_epoch_canary(tmp_path, monkeypatch):
    # r12 ADVICE: the suite walls were measured on a 1.5x-slower boot
    # (suite records carry canary 0.36 vs budget suite canary 0.24)
    # while the bench sidecar was measured on a budget-speed boot
    # (canary 0.24 flat). Suite raw growth +50% must be cleared by the
    # SUITE canary pair; applying the bench canary (flat) would have
    # flagged it.
    rc = _run_guard(
        tmp_path,
        monkeypatch,
        budget={
            "suite_sec_per_test": 1.0,
            "suite_machine_canary_sec": 0.24,
            "bench_wall_sec": 300.0,
            "bench_machine_canary_sec": 0.24,
        },
        sidecar={"bench_wall_sec": 310.0, "machine_canary_sec": 0.24},
        walls_records=[
            {"ts": 3, "n_tests": 300, "wall_s": 450.0, "exit": 0,
             "canary_s": 0.36},
        ],
    )
    assert rc == 0


# ---------------------------------------------------------------------
# r15: control-set normalization — the r14 verdict's top tooling item.
# The single-thread canary cannot see multi-core contention (r14's
# driver bench flagged +23.3% at canary ratio 1.012 while untouched
# controls moved ±40% in both directions); the median wall ratio of
# the untouched TPC-H controls, timed inside the same parallel
# session, is the deflator that can.
# ---------------------------------------------------------------------

_CONTROLS_FLAT = {
    "q4_late_shipment_priority": 1.0,
    "q12_priority_by_returnflag": 0.5,
    "q14_promo_revenue": 0.5,
    "q18_large_volume_orders": 1.0,
}


def _scaled(walls, f):
    return {k: round(v * f, 3) for k, v in walls.items()}


def test_control_ratio_is_median_and_requires_pairing():
    ratio, n = wall_budget.control_ratio(
        _scaled(_CONTROLS_FLAT, 1.3), _CONTROLS_FLAT
    )
    assert n == 4 and ratio == 1.3
    # median, not mean: one outlier control cannot drag the deflator
    noisy = _scaled(_CONTROLS_FLAT, 1.3)
    noisy["q18_large_volume_orders"] *= 10
    ratio, n = wall_budget.control_ratio(noisy, _CONTROLS_FLAT)
    assert n == 4 and ratio == 1.3
    # < MIN_CONTROLS paired -> None (missing + zero walls both unpair)
    two = {
        "q4_late_shipment_priority": 1.2,
        "q12_priority_by_returnflag": 0.6,
        "q14_promo_revenue": 0.0,
    }
    ratio, n = wall_budget.control_ratio(two, _CONTROLS_FLAT)
    assert ratio is None and n == 2
    assert wall_budget.control_ratio(None, None) == (None, 0)


def test_pure_noise_run_self_triages_via_controls(tmp_path, monkeypatch, capsys):
    # The r14 driver-bench shape: wall +33% raw, single-thread canary
    # FLAT (multi-core contention is invisible to it) — but the
    # untouched controls inflated by the same 33%. The old guard
    # flagged this; the control deflator must pass it, and the output
    # must say so arithmetically (no more per-query archaeology).
    rc = _run_guard(
        tmp_path,
        monkeypatch,
        budget={
            "suite_sec_per_test": 1.0,
            "bench_wall_sec": 300.0,
            "bench_machine_canary_sec": 0.25,
            "bench_control_walls": _CONTROLS_FLAT,
        },
        sidecar={
            "bench_wall_sec": 400.0,
            "machine_canary_sec": 0.25,  # canary alone would FLAG
            "queries": _scaled(_CONTROLS_FLAT, 4.0 / 3.0),
        },
        walls_records=_OK_WALLS,
    )
    assert rc == 0
    outp = capsys.readouterr().out
    assert "controls inflated" in outp and "normalized growth" in outp


def test_real_regression_survives_control_normalization(
    tmp_path, monkeypatch
):
    # Controls flat (the host is genuinely fine) + wall +33%: a REAL
    # regression in the touched queries — controls must NOT absolve it,
    # even though a slower-host canary would have (the reverse masking
    # direction: controls outrank the canary).
    rc = _run_guard(
        tmp_path,
        monkeypatch,
        budget={
            "suite_sec_per_test": 1.0,
            "bench_wall_sec": 300.0,
            "bench_machine_canary_sec": 0.25,
            "bench_control_walls": _CONTROLS_FLAT,
        },
        sidecar={
            "bench_wall_sec": 400.0,
            "machine_canary_sec": 0.35,  # canary would have CLEARED it
            "queries": dict(_CONTROLS_FLAT),
        },
        walls_records=_OK_WALLS,
    )
    assert rc == 1


def test_missing_controls_fall_back_to_canary(tmp_path, monkeypatch):
    # A budget predating r15 (no bench_control_walls) keeps the r13
    # canary behavior: +33% wall on a 1.4x-slower host passes.
    rc = _run_guard(
        tmp_path,
        monkeypatch,
        budget={
            "suite_sec_per_test": 1.0,
            "bench_wall_sec": 300.0,
            "machine_canary_sec": 0.25,
        },
        sidecar={"bench_wall_sec": 400.0, "machine_canary_sec": 0.35},
        walls_records=_OK_WALLS,
    )
    assert rc == 0


def test_update_records_control_walls(tmp_path, monkeypatch):
    budget_p = tmp_path / "wall_budget.json"
    side_p = tmp_path / "bench_structure.json"
    side_p.write_text(
        json.dumps(
            {
                "bench_wall_sec": 300.0,
                "machine_canary_sec": 0.25,
                "queries": dict(_CONTROLS_FLAT),
            }
        )
    )
    walls_p = tmp_path / "walls.jsonl"
    _write_jsonl(walls_p, _OK_WALLS)
    monkeypatch.setattr(wall_budget, "BUDGET", str(budget_p))
    monkeypatch.setattr(wall_budget, "BENCH_SIDE", str(side_p))
    monkeypatch.setattr(wall_budget, "WALLS", str(walls_p))
    monkeypatch.setattr(sys, "argv", ["wall_budget.py", "--update"])
    assert wall_budget.main() == 0
    saved = json.loads(budget_p.read_text())
    assert saved["bench_control_walls"] == _CONTROLS_FLAT


def test_cross_sf_sidecar_skips_bench_comparison(tmp_path, monkeypatch, capsys):
    # An sf0.01 iteration sidecar against the sf0.1 budget would read
    # as a massive deflation (r15: observed +85% "normalized growth"
    # on a 2x-faster control set) — walls are only comparable at the
    # same scale factor, so the guard must SKIP, not flag.
    rc = _run_guard(
        tmp_path,
        monkeypatch,
        budget={
            "suite_sec_per_test": 1.0,
            "bench_wall_sec": 300.0,
            "bench_sf": 0.1,
            "bench_control_walls": _CONTROLS_FLAT,
        },
        sidecar={
            "bench_wall_sec": 900.0,  # would flag hard if compared
            "sf": 0.01,
            "queries": _scaled(_CONTROLS_FLAT, 0.5),
        },
        walls_records=_OK_WALLS,
    )
    assert rc == 0
    assert "not comparable" in capsys.readouterr().out
