"""Regenerate tools/oracle_manifest.json — the pin-on-change ledger.

The manifest records md5(oracle_sql) per registered query (null for the
rows-only-by-design queries).  A static test
(tests/test_gate_rotation.py::test_oracle_changes_are_pinned) fails
whenever a query's current oracle hash differs from the manifest entry
but the query is NOT pinned in _RECHECK_FIRST — making the round-8
judge finding ("changed 5 queries' oracles, pinned 5 other names")
mechanically impossible to repeat.

Workflow when an oracle changes:
  1. edit the oracle,
  2. add the query name to _RECHECK_FIRST (registry/__init__.py),
  3. run `python tools/gen_oracle_manifest.py` and commit the refreshed
     manifest alongside the change.

The generator itself enforces step 2: it refuses to absorb a changed
hash for an unpinned query (--force overrides, for deliberate manifest
repairs only).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

MANIFEST = os.path.join(ROOT, "tools", "oracle_manifest.json")


def current_hashes() -> dict[str, str | None]:
    from movie_recommendation_engine_spark.registry import ORACLES, QUERIES

    return {
        n: (
            hashlib.md5(ORACLES[n].encode()).hexdigest()
            if n in ORACLES
            else None
        )
        for n in sorted(QUERIES)
    }


def main(argv: list[str]) -> int:
    force = "--force" in argv
    from movie_recommendation_engine_spark.registry import _RECHECK_FIRST

    new = current_hashes()
    old: dict[str, str | None] = {}
    if os.path.exists(MANIFEST):
        with open(MANIFEST) as fh:
            old = json.load(fh)

    changed_unpinned = sorted(
        n
        for n, h in new.items()
        if n in old and old[n] != h and n not in _RECHECK_FIRST
    )
    if changed_unpinned and not force:
        print(
            "REFUSED: oracle hash changed for unpinned queries "
            f"{changed_unpinned} — add them to _RECHECK_FIRST first "
            "(or --force for a deliberate manifest repair)",
            file=sys.stderr,
        )
        return 1

    with open(MANIFEST, "w") as fh:
        json.dump(new, fh, indent=1, sort_keys=True)
        fh.write("\n")
    n_changed = sum(1 for n, h in new.items() if old.get(n, h) != h)
    n_new = sum(1 for n in new if n not in old)
    n_gone = sum(1 for n in old if n not in new)
    print(
        f"wrote {MANIFEST}: {len(new)} queries "
        f"({n_changed} changed, {n_new} new, {n_gone} removed)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
