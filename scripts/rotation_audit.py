"""Rotation audit: mechanical staleness bookkeeping for the 50-slot
driver correctness window.

The driver gates the FIRST 50 registry slots each round
(CORRECTNESS_r{N}.json). Stale verdicts accumulate silently, and r9
shipped a window comment that MIS-claimed two queries were in the
rotation (VERDICT r9 "what's wrong" #2) — a bookkeeping class of error
this script makes impossible to repeat by DERIVING the facts from the
artifacts instead of asserting them by hand:

- each registered query's LATEST driver verdict round (scanned from
  every CORRECTNESS_r*.json present);
- the current first-50 window (the actual registration order, after
  `_reorder_registry`);
- which registered queries have NO verdict yet (must lead the window);
- which queries fall PAST the two-round staleness boundary after this
  round's window lands (i.e. latest verdict < current_round - 1 and not
  in the window) — the r11 rotation debt, computed, not guessed.

Usage: python scripts/rotation_audit.py [current_round]
Exit 1 if an unverdicted query is missing from the window head.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def latest_verdicts() -> dict[str, int]:
    latest: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        data = json.load(open(p))
        queries = data.get("queries", data)
        for name in queries:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    import __spark_entry__ as em

    order = list(em.queries())
    window = order[:WINDOW]
    latest = latest_verdicts()
    cur = (
        int(sys.argv[1])
        if len(sys.argv) > 1
        else (max(latest.values(), default=0) + 1)
    )

    never = [q for q in order if q not in latest]
    print(f"registry: {len(order)} queries; window = first {WINDOW}; "
          f"assuming current round r{cur}")
    print(f"\nnever-verdicted ({len(never)}): {never or '—'}")

    missing_first = [q for q in never if q not in window]
    if missing_first:
        print(f"  ERROR: never-verdicted but NOT in the window: {missing_first}")

    # verdict ages after this round's window lands
    post = {q: (cur if q in window else latest.get(q, 0)) for q in order}
    stale_next = sorted(
        (q for q, r in post.items() if r and r < cur - 1),
        key=lambda q: post[q],
    )
    by_round: dict[int, list[str]] = {}
    for q in order:
        if q not in window and q in latest:
            by_round.setdefault(latest[q], []).append(q)
    print("\nout-of-window verdict ages (latest round -> count):")
    for r in sorted(by_round):
        print(f"  r{r}: {len(by_round[r])}")

    print(
        f"\nr{cur + 1} rotation debt (will sit past the two-round boundary "
        f"if not windowed next round): {len(stale_next)}"
    )
    for q in stale_next:
        print(f"  {q} (latest r{post[q]})")

    window_stale = [q for q in window if q in latest and latest[q] >= cur]
    if window_stale:
        print(f"\nnote: {len(window_stale)} window slots already verdicted r{cur}+")

    sys.exit(1 if missing_first else 0)


if __name__ == "__main__":
    main()
