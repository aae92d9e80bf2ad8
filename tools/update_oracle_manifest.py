"""Regenerate tests/oracle_manifest.json — the committed md5 of every
battery entry's oracle SQL text.

tests/test_registration.py compares the live ``oracle_sql()`` map
against this manifest: an entry whose oracle text changed WITHOUT the
entry listing itself in ``__spark_entry__._REGRADE_THIS_ROUND`` fails
CI.  That codifies the round-7 grading-order contract (a semantics
flip must re-grade inside the round's window — a stale verdict on
changed semantics is debt, not coverage) as a mechanical check instead
of a convention.

Run after ANY intentional oracle change:

    python tools/update_oracle_manifest.py

then, if the change altered the entry's SEMANTICS (not just
formatting), also add the entry name to ``_REGRADE_THIS_ROUND``.
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

MANIFEST = REPO / "tests" / "oracle_manifest.json"


def oracle_hashes() -> dict[str, str]:
    import __spark_entry__ as entry_mod

    return {
        name: hashlib.md5(sql.encode()).hexdigest()
        for name, sql in sorted(entry_mod.oracle_sql().items())
    }


def main() -> None:
    hashes = oracle_hashes()
    MANIFEST.write_text(json.dumps(hashes, indent=1, sort_keys=True) + "\n")
    print(f"wrote {MANIFEST} ({len(hashes)} oracle entries)")


if __name__ == "__main__":
    main()
