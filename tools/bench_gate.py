"""Automated drift-protocol check for the BENCH ≤2× gate.

The grading gate compares every per-query bench time against the FIRST
number ever recorded for that query (BASELINE.md protocol).  Those
first-recorded values live in the git history of BENCH_DETAIL.json, so
this tool (a) reconstructs them once into BENCH_HISTORY.json — first
value, the commit that recorded it, and the all-time minimum (the
machine-capability floor, used to tell ambient drift from a real
regression) — and (b) compares the CURRENT BENCH_DETAIL.json against
them, printing every query whose ratio exceeds the warn threshold and
failing if any exceeds the gate.

Usage:
    python tools/bench_gate.py rebuild    # regenerate BENCH_HISTORY.json
    python tools/bench_gate.py check      # gate current BENCH_DETAIL.json
    python tools/bench_gate.py check --warn 1.5 --gate 2.0

`check` distinguishes the two failure shapes the drift protocol cares
about: a UNIFORM shift of the whole battery (median ratio moves with
the outliers → ambient host drift; document it, don't chase code) vs an
ISOLATED outlier (median stays put → a real per-query regression;
re-measure min-of-3 and root-cause before believing it).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path
from statistics import median

REPO = Path(__file__).resolve().parents[1]
HISTORY = REPO / "BENCH_HISTORY.json"
DETAIL = REPO / "BENCH_DETAIL.json"


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def _protocol_at(sha: str) -> str:
    """Measurement discipline in force when a pin was recorded, read
    from THAT commit's bench.py (VERDICT r09 task 7: `first` values
    span three disciplines; future drift adjudication should not have
    to re-litigate which protocol a pin was taken under).

    * ``in-session``      — pre-r8: every entry timed inside one aging
                            JVM session, no BLAS thread cap.
    * ``isolated-v1``     — r8/r9: BLAS env+ctypes caps in force,
                            min(in-session, fresh-process) for the
                            BLAS/recall/streaming isolation list.
    * ``isolated-v2``     — r10+: isolation list extended to the
                            shingle/doc-dedup family.
    """
    try:
        bench = _git("show", f"{sha}:bench.py")
    except subprocess.CalledProcessError:
        return "in-session"
    if "ISOLATE_DEFAULT" not in bench:
        return "in-session"
    if "dedup_minhash_lsh" in bench.split("ISOLATE_DEFAULT", 1)[1][:2000]:
        return "isolated-v2"
    return "isolated-v1"


def rebuild(sf: float = 0.1) -> None:
    """Only commits benched at the gate's scale factor count — dev-loop
    runs at sf0.01 would otherwise poison the first-recorded values."""
    commits = _git(
        "log", "--reverse", "--format=%H %ct", "--", "BENCH_DETAIL.json"
    ).splitlines()
    hist: dict[str, dict] = {}
    protocols: dict[str, str] = {}
    for line in commits:
        sha, ct = line.split()
        try:
            blob = _git("show", f"{sha}:BENCH_DETAIL.json")
            detail = json.loads(blob)
        except (subprocess.CalledProcessError, json.JSONDecodeError):
            continue
        if detail.get("sf") != sf:
            continue
        if sha not in protocols:
            protocols[sha] = _protocol_at(sha)
        for name, sec in detail.get("queries", {}).items():
            if not isinstance(sec, (int, float)):
                continue
            h = hist.setdefault(
                name,
                {
                    "first": sec,
                    "first_commit": sha[:10],
                    "min": sec,
                    "protocol": protocols[sha],
                },
            )
            h["min"] = min(h["min"], sec)
    with open(HISTORY, "w") as fh:
        json.dump(hist, fh, indent=1, sort_keys=True)
    print(f"BENCH_HISTORY.json: {len(hist)} queries from {len(commits)} commits")


def check(warn: float, gate: float) -> int:
    if not HISTORY.exists():
        print("no BENCH_HISTORY.json — run `rebuild` first", file=sys.stderr)
        return 2
    hist = json.load(open(HISTORY))
    detail = json.load(open(DETAIL))
    ratios: dict[str, float] = {}
    new: list[str] = []
    for name, sec in detail.get("queries", {}).items():
        if not isinstance(sec, (int, float)):
            continue  # errored query ("ERROR: ..." string) — not a ratio
        if name in hist:
            # bench times are rounded to 3 decimals, so a sub-ms query
            # records 0.0 — floor the denominator instead of crashing
            ratios[name] = sec / max(hist[name]["first"], 1e-3)
        else:
            new.append(name)
    if not ratios:
        print("no overlapping queries between detail and history", file=sys.stderr)
        return 2
    med = median(ratios.values())
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])
    print(
        f"{len(ratios)} queries vs first-recorded: median ratio {med:.2f}, "
        f"worst {worst[0][1]:.2f}x ({worst[0][0]})"
        + (f"; {len(new)} new (no history yet): {sorted(new)}" if new else "")
    )
    flagged = [(n, r) for n, r in worst if r > warn]
    for n, r in flagged:
        shape = (
            "uniform-drift candidate (median moved too)"
            if med > warn * 0.85
            else "ISOLATED outlier — re-measure min-of-3 and root-cause"
        )
        print(
            f"  {r:5.2f}x  {n}  (first {hist[n]['first']}s @ "
            f"{hist[n]['first_commit']}, all-time min {hist[n]['min']}s) — {shape}"
        )
    over_gate = [n for n, r in flagged if r > gate]
    if over_gate:
        print(f"GATE BREACH (> {gate}x): {over_gate}", file=sys.stderr)
        return 1
    print(f"gate OK: no query over {gate}x of first-recorded")
    return 0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["rebuild", "check"])
    p.add_argument("--warn", type=float, default=1.5)
    p.add_argument("--gate", type=float, default=2.0)
    a = p.parse_args()
    if a.cmd == "rebuild":
        rebuild()
        return 0
    return check(a.warn, a.gate)


if __name__ == "__main__":
    sys.exit(main())
