"""Dev-loop A/B timer: warm at sf0.001, then time named declared
queries at $SPARK_GRAFT_SF_DIR (default sf0.1) with N in-session
repeats (default 4), reporting min/median plus /proc/loadavg before
and after — the round-12 answer to the documented 3× ambient swings
on this box (min-of-2 fresh-process runs of IDENTICAL code measured
3.07 vs 10.68 s).  Not part of the bench protocol; bench.py stays the
authoritative number.

Usage: python tools/time_one.py <query> [<query>...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "4"))


def loadavg() -> str:
    return open("/proc/loadavg").read().split()[0]


def main() -> None:
    from rdbms_subsetter_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("time-one")
    qs = entry_mod.queries()
    for name in sys.argv[1:]:
        fn = qs[name]
        try:
            fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
        la0 = loadavg()
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps(
                {
                    "query": name,
                    "min": min(times),
                    "median": statistics.median(times),
                    "times": times,
                    "load_before": la0,
                    "load_after": loadavg(),
                }
            )
        )


if __name__ == "__main__":
    main()
