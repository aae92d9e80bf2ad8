"""Unit tests for tools/bench_gate.py: sf filtering during history
rebuild and the uniform-drift vs isolated-outlier classification in
check().  Uses synthetic history/detail files via monkeypatched paths —
no git or Spark involved."""

import json

import pytest

from tools import bench_gate


def _write(tmp_path, name, obj):
    p = tmp_path / name
    with open(p, "w") as fh:
        json.dump(obj, fh)
    return p


@pytest.fixture()
def patched(tmp_path, monkeypatch):
    hist = {
        "q_fast": {"first": 1.0, "first_commit": "aaaa", "min": 0.9},
        "q_slow": {"first": 2.0, "first_commit": "aaaa", "min": 1.8},
        "q_mid": {"first": 1.0, "first_commit": "bbbb", "min": 1.0},
    }
    monkeypatch.setattr(
        bench_gate, "HISTORY", _write(tmp_path, "BENCH_HISTORY.json", hist)
    )

    def set_detail(queries):
        monkeypatch.setattr(
            bench_gate,
            "DETAIL",
            _write(
                tmp_path,
                "BENCH_DETAIL.json",
                {"sf": 0.1, "queries": queries},
            ),
        )

    return set_detail


def test_gate_ok_and_new_queries_reported(patched, capsys):
    patched({"q_fast": 1.1, "q_slow": 2.1, "q_mid": 1.0, "q_new": 5.0})
    assert bench_gate.check(warn=1.5, gate=2.0) == 0
    out = capsys.readouterr().out
    assert "gate OK" in out and "q_new" in out


def test_isolated_outlier_breaches_gate(patched, capsys):
    patched({"q_fast": 2.5, "q_slow": 2.0, "q_mid": 1.0})
    assert bench_gate.check(warn=1.5, gate=2.0) == 1
    err_out = capsys.readouterr()
    assert "GATE BREACH" in err_out.err
    assert "ISOLATED outlier" in err_out.out


def test_uniform_drift_classified(patched, capsys):
    # the whole battery shifted ~1.6-2.1x -> median moves with the outliers
    patched({"q_fast": 1.6, "q_slow": 4.2, "q_mid": 1.6})
    assert bench_gate.check(warn=1.5, gate=2.0) == 1
    assert "uniform-drift candidate" in capsys.readouterr().out


def test_missing_history_is_an_error(tmp_path, monkeypatch):
    monkeypatch.setattr(bench_gate, "HISTORY", tmp_path / "absent.json")
    assert bench_gate.check(warn=1.5, gate=2.0) == 2


def test_rebuild_filters_by_sf(tmp_path, monkeypatch):
    """Commits benched at a different sf must not contribute
    first-recorded values."""
    blobs = {
        "c1": {"sf": 0.01, "queries": {"q": 0.1}},
        "c2": {"sf": 0.1, "queries": {"q": 1.0}},
        "c3": {"sf": 0.1, "queries": {"q": 0.8}},
    }

    def fake_git(*args):
        if args[0] == "log":
            return "c1 1\nc2 2\nc3 3"
        if args[0] == "show":
            sha = args[1].split(":")[0]
            return json.dumps(blobs[sha])
        raise AssertionError(args)

    monkeypatch.setattr(bench_gate, "_git", fake_git)
    monkeypatch.setattr(bench_gate, "HISTORY", tmp_path / "BENCH_HISTORY.json")
    bench_gate.rebuild(sf=0.1)
    hist = json.load(open(tmp_path / "BENCH_HISTORY.json"))
    assert hist["q"]["first"] == 1.0          # c2, not the sf0.01 c1
    assert hist["q"]["first_commit"] == "c2"[:10]
    assert hist["q"]["min"] == 0.8            # c3 lowered the floor
