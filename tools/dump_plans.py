"""Dump ``explain("formatted")`` for named declared queries to files.

Usage: python tools/dump_plans.py <outdir> <suffix> <query> [<query>...]

Writes ``<outdir>/<query>_<suffix>.txt`` for each query — the judge-facing
plan evidence for optimization rounds (plans/r11/*_before.txt / _after.txt).
Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1), the bench SF.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    outdir, suffix, names = Path(sys.argv[1]), sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from rdbms_subsetter_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("plan-dump")
    qs = entry_mod.queries()
    outdir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (outdir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {outdir / f'{name}_{suffix}.txt'} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
