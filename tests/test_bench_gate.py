"""Unit tests for bench.py's ambient-load gate (BASELINE.md protocol).

No SparkSession needed — the gate runs BEFORE the JVM comes up and its
contract is pure: wait for quiet up to a budget, then report whether
the run is cross-round comparable."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_gate_passes_on_quiet_host(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LOAD_GATE", "1000000")
    monkeypatch.setenv("SPARK_GRAFT_LOAD_WAIT", "0")
    out = bench._load_gate()
    assert out["comparable"] is True
    assert out["waited_sec"] == 0.0
    assert out["threshold"] == 1000000.0


def test_gate_stamps_non_comparable_without_blocking_forever(monkeypatch):
    """Threshold 0 can never be satisfied: the gate must give up at the
    wait budget and stamp comparable=False — never raise, never hang
    (the driver contract is one JSON line, exit 0)."""
    monkeypatch.setenv("SPARK_GRAFT_LOAD_GATE", "0")
    monkeypatch.setenv("SPARK_GRAFT_LOAD_WAIT", "0")
    out = bench._load_gate()
    assert out["comparable"] is False
    assert out["waited_sec"] == 0.0


def test_gate_waits_then_passes(monkeypatch):
    """The gate polls until loadavg drops below the threshold."""
    monkeypatch.setenv("SPARK_GRAFT_LOAD_GATE", "2.0")
    monkeypatch.setenv("SPARK_GRAFT_LOAD_WAIT", "600")
    loads = iter([(9.0, 0, 0), (9.0, 0, 0), (1.0, 0, 0)])
    monkeypatch.setattr(bench.os, "getloadavg", lambda: next(loads))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    out = bench._load_gate()
    assert out["comparable"] is True
    assert out["start"] == 1.0
    assert out["waited_sec"] > 0


def test_gate_tolerates_missing_getloadavg(monkeypatch):
    """Platforms without getloadavg must not break the bench contract."""

    def boom():
        raise OSError("no loadavg")

    monkeypatch.setattr(bench.os, "getloadavg", boom)
    out = bench._load_gate()
    assert out["comparable"] is True
    assert out["start"] is None


# --- pin-relative comparability stamp (r12, r11 verdict item 1) ------------


def _write_pin(tmp_path, pin):
    import json

    p = tmp_path / "proxy.json"
    p.write_text(json.dumps({"queries": {}, "host_pin": pin}))
    return str(p)


def test_pin_drift_comparable_within_band(tmp_path):
    path = _write_pin(tmp_path, {"q1_duckdb_sec": 0.10, "q1_spark_sec": 1.0})
    out = bench._pin_drift(
        {"q1_duckdb_sec": 0.11, "q1_spark_sec": 1.2}, proxy_path=path
    )
    assert out["comparable_pins"] is True
    assert out["drift_factor"] == 1.1
    assert out["drift_spark"] == 1.2
    assert out["pin_q1_duckdb_sec"] == 0.10


def test_pin_drift_flags_sustained_regime(tmp_path):
    """The r11 failure shape: both engines ~1.2x slower mid-run while
    the start gate passed — the pin stamp must say non-comparable."""
    path = _write_pin(tmp_path, {"q1_duckdb_sec": 0.102, "q1_spark_sec": 1.09})
    out = bench._pin_drift({"q1_duckdb_sec": 0.124}, proxy_path=path)
    assert out["comparable_pins"] is False
    assert out["drift_factor"] > bench.PIN_DRIFT_TOL


def test_pin_drift_flags_too_fast_too(tmp_path):
    """A run FASTER than the pin beyond the band is equally
    non-comparable — a future quiet-era pin recorded under load would
    otherwise make every honest run look like a regression."""
    path = _write_pin(tmp_path, {"q1_duckdb_sec": 0.20})
    out = bench._pin_drift({"q1_duckdb_sec": 0.10}, proxy_path=path)
    assert out["comparable_pins"] is False


def test_pin_drift_unknown_without_pin(tmp_path):
    """No recorded pin (or no DuckDB in the run) must stamp None — the
    reader must not mistake 'could not check' for 'checked clean'."""
    import json

    p = tmp_path / "proxy.json"
    p.write_text(json.dumps({"queries": {}}))
    out = bench._pin_drift({"q1_duckdb_sec": 0.1}, proxy_path=str(p))
    assert out["comparable_pins"] is None
    assert out["drift_factor"] is None
    path = _write_pin(tmp_path, {"q1_duckdb_sec": 0.10})
    out2 = bench._pin_drift({}, proxy_path=path)
    assert out2["comparable_pins"] is None


def test_pin_drift_tolerates_missing_proxy_file(tmp_path):
    out = bench._pin_drift(
        {"q1_duckdb_sec": 0.1}, proxy_path=str(tmp_path / "nope.json")
    )
    assert out["comparable_pins"] is None


def test_pin_drift_is_per_sf_dir(tmp_path):
    """The r11 ~sf1 lesson: host regimes are volume-dependent (the sf1
    DuckDB pin ran 1.5-1.8x slower across rounds while the sf0.1 pin
    was stable), so a pin recorded at one sf_dir must never adjudicate
    a run at another — verdict None, not a cross-sf compare."""
    import json

    p = tmp_path / "proxy.json"
    p.write_text(json.dumps({
        "queries": {},
        "host_pins": {
            "/data/sf0.1": {"q1_duckdb_min_sec": 0.10, "sf_dir": "/data/sf0.1"},
            "/data/replica10x": {"q1_duckdb_min_sec": 0.25,
                                 "sf_dir": "/data/replica10x"},
        },
        "host_pin": {"q1_duckdb_min_sec": 0.10, "sf_dir": "/data/sf0.1"},
    }))
    # exact per-sf match: the sf1 run adjudicates against the sf1 pin
    out = bench._pin_drift(
        {"q1_duckdb_min_sec": 0.26}, sf_dir="/data/replica10x",
        proxy_path=str(p),
    )
    assert out["comparable_pins"] is True and out["drift_factor"] == 1.04
    # unknown sf_dir, legacy pin recorded for a DIFFERENT sf: no verdict
    out2 = bench._pin_drift(
        {"q1_duckdb_min_sec": 0.26}, sf_dir="/data/sf9", proxy_path=str(p)
    )
    assert out2["comparable_pins"] is None


def test_pin_drift_legacy_single_pin_still_applies_to_its_sf(tmp_path):
    import json

    p = tmp_path / "proxy.json"
    p.write_text(json.dumps({
        "queries": {},
        "host_pin": {"q1_duckdb_min_sec": 0.10, "sf_dir": "/data/sf0.1"},
    }))
    out = bench._pin_drift(
        {"q1_duckdb_min_sec": 0.11}, sf_dir="/data/sf0.1", proxy_path=str(p)
    )
    assert out["comparable_pins"] is True


# --- pin-normalized cross-run comparison (scripts/compare_bench.py) --------


def test_compare_bench_normalizes_both_sides():
    import sys as _sys, os as _os

    _sys.path.insert(0, _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "scripts"))
    from compare_bench import compare

    old = {"queries": {"q": 1.0},
           "comparability": {"drift_factor": 1.0}}
    new = {"queries": {"q": 1.2},
           "comparability": {"drift_factor": 1.2}}
    rows = compare(old, new)
    # 1.2 wall / 1.2 drift = 1.0 normalized — a pure regime shift must
    # NOT flag (the r11 uniform-drift misreading, automated away)
    assert rows[0]["ratio"] == 1.0 and rows[0]["flag"] is False


def test_compare_bench_flags_real_regressions_and_handles_unstamped():
    import sys as _sys, os as _os

    _sys.path.insert(0, _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "scripts"))
    from compare_bench import compare

    old = {"queries": {"q": 1.0, "r": 1.0}}  # unstamped -> drift 1.0
    new = {"queries": {"q": 1.5, "r": 1.1},
           "comparability": {"drift_factor": None}}
    rows = {r["query"]: r for r in compare(old, new)}
    assert rows["q"]["flag"] is True and rows["q"]["ratio"] == 1.5
    assert rows["r"]["flag"] is False
