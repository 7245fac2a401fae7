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
