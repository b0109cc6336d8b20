"""Gate-order telemetry: why each query is in this round's driver gate
window (round-11 verdict #6).

The driver's correctness gate evaluates the FIRST 50 registered queries;
``registry._apply_gate_order`` computes that window per round from pins
(``_RECHECK_FIRST``, code paths changed this round), pending queries
(never driver-green), and staleness rotation (oldest driver evidence
first).  The per-round CORRECTNESS_r{N}.json records pass/fail but not
WHY each query held a slot — reconstructing rotation health previously
meant replaying the ordering against every historical artifact.

This tool writes ``GATE_ORDER.json`` at the repo root: one entry per
window slot with a ``reason`` (``pin`` / ``pending`` / ``stale-rotation``),
the query's last driver-green round, and the evidence files the window
was computed from — so a reviewer can verify rotation health (no
evidence older than the rotation contract allows) by reading one file.

Run after changing pins or when a new CORRECTNESS_r*.json lands, and
commit the output:

    python tools/gen_gate_order.py

``tests/test_gate_rotation.py`` keeps the committed file honest: it
recomputes the window from the artifact's OWN evidence-file list (not
the live glob — the driver appends next round's results after commit)
and asserts every entry's reason and ordering invariants.
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_PATH = os.path.join(ROOT, "GATE_ORDER.json")
WINDOW = 50


def compute() -> dict:
    """The telemetry document, always from the LIVE evidence glob: the
    registry's in-memory window order is import-time state computed
    from that same glob, so reasons and ordering are consistent by
    construction.  (No evidence-list parameter: pairing the live order
    with a different evidence set would produce internally inconsistent
    telemetry — the sync test replays the reason logic itself via
    ``_green_rounds(paths)`` instead.)"""
    sys.path.insert(0, ROOT)
    from movie_recommendation_engine_spark import registry as R

    import glob

    evidence_paths = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    green = R._green_rounds(evidence_paths)
    pins = list(R._RECHECK_FIRST)
    names = list(R.QUERIES)
    window = []
    for name in names[:WINDOW]:
        if name not in green:
            reason = "pending"
        elif name in pins:
            reason = "pin"
        else:
            reason = "stale-rotation"
        window.append(
            {
                "name": name,
                "reason": reason,
                "last_green_round": green.get(name),
            }
        )
    outside = [green[n] for n in names[WINDOW:] if n in green]
    rounds = [
        int(m.group(1))
        for p in evidence_paths
        for m in [re.search(r"_r(\d+)\.json$", p)]
        if m
    ]
    return {
        "for_round": (max(rounds) + 1) if rounds else 1,
        "evidence_files": [os.path.basename(p) for p in evidence_paths],
        "pins": pins,
        "window_size": WINDOW,
        "window": window,
        "outside_window_oldest_evidence_round": min(outside) if outside else None,
        "note": (
            "reason per gate-window slot: 'pin' = code path changed this "
            "round (_RECHECK_FIRST), 'pending' = never driver-green, "
            "'stale-rotation' = green but oldest driver evidence "
            "(the self-rotating remainder).  Window order: pins lead the "
            "already-green block; pending queries precede it.  "
            "Recompute/verify: python tools/gen_gate_order.py; the sync "
            "test recomputes from evidence_files, not the live glob."
        ),
    }


def main() -> int:
    doc = compute()
    with open(OUT_PATH, "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    by_reason: dict[str, int] = {}
    for e in doc["window"]:
        by_reason[e["reason"]] = by_reason.get(e["reason"], 0) + 1
    print(
        f"wrote {OUT_PATH}: round {doc['for_round']}, window {doc['window_size']} "
        f"({', '.join(f'{v} {k}' for k, v in sorted(by_reason.items()))}), "
        f"oldest evidence outside window: r{doc['outside_window_oldest_evidence_round']}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
