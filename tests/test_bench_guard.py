"""The bench sidecar guard: BENCH_FULL.json is the round's durable
benchmark record; a smoke run (lower sf, or a BENCH_ONLY subset) must
not replace it silently. Round 9 lost its committed sf0.1 record to
exactly that — a stray sf0.001 run one commit before the snapshot."""

from __future__ import annotations

import json
import os

import bench


def _write(path, sf, n):
    with open(path, "w") as fh:
        json.dump({"sf": sf, "n_queries": n, "value": 1.0}, fh)


def test_guard_blocks_lower_sf(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    sidecar = str(tmp_path / "BENCH_FULL.json")
    _write(sidecar, 0.1, 179)
    assert not bench._sidecar_writable(sidecar, {"sf": 0.001, "n_queries": 179})
    assert not bench._sidecar_writable(sidecar, {"sf": 0.01, "n_queries": 200})


def test_guard_blocks_subset_run(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    sidecar = str(tmp_path / "BENCH_FULL.json")
    _write(sidecar, 0.1, 179)
    assert not bench._sidecar_writable(sidecar, {"sf": 0.1, "n_queries": 2})


def test_guard_allows_equal_or_bigger(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    sidecar = str(tmp_path / "BENCH_FULL.json")
    _write(sidecar, 0.1, 179)
    assert bench._sidecar_writable(sidecar, {"sf": 0.1, "n_queries": 179})
    assert bench._sidecar_writable(sidecar, {"sf": 0.1, "n_queries": 185})
    assert bench._sidecar_writable(sidecar, {"sf": 1.0, "n_queries": 179})


def test_guard_allows_missing_or_corrupt(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    sidecar = str(tmp_path / "BENCH_FULL.json")
    assert bench._sidecar_writable(sidecar, {"sf": 0.001, "n_queries": 1})
    with open(sidecar, "w") as fh:
        fh.write("not json")
    assert bench._sidecar_writable(sidecar, {"sf": 0.001, "n_queries": 1})


def test_guard_force_overrides(tmp_path, monkeypatch):
    sidecar = str(tmp_path / "BENCH_FULL.json")
    _write(sidecar, 0.1, 179)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FORCE", "1")
    assert bench._sidecar_writable(sidecar, {"sf": 0.001, "n_queries": 1})


def test_nonnumeric_sf_never_clobbers_numeric(tmp_path, monkeypatch):
    """A custom SF dir whose name doesn't parse (payload sf is a string)
    compares as 0.0 and is blocked against a real record."""
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    sidecar = str(tmp_path / "BENCH_FULL.json")
    _write(sidecar, 0.1, 179)
    assert not bench._sidecar_writable(
        sidecar, {"sf": "custom", "n_queries": 179}
    )


def test_existing_custom_sf_record_is_protected(tmp_path, monkeypatch):
    """A force-written custom-SF record (string sf) must be protected
    like any full record — unparseable sf is not 'corrupt'."""
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FORCE", raising=False)
    sidecar = str(tmp_path / "BENCH_FULL.json")
    with open(sidecar, "w") as fh:
        json.dump({"sf": "custom", "n_queries": 179, "value": 1.0}, fh)
    assert not bench._sidecar_writable(sidecar, {"sf": 0.001, "n_queries": 1})
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FORCE", "1")
    assert bench._sidecar_writable(sidecar, {"sf": 0.001, "n_queries": 1})
