"""Compute the next round's _WINDOW seat plan from the artifacts.

The seat math drifted twice when done by hand (r6 verdict "What's
wrong" #2); this derives it mechanically from the same inputs
tests/test_registry.py enforces:

- HARD-mandatory: registered queries with no row in the last FOUR
  recorded CORRECTNESS rounds (they fail the staleness test if
  unseated).
- EXPIRING-next: queries whose newest row is exactly four rounds old
  after the upcoming round records — seat them now or they become
  hard-mandatory next round (the smooth-rotation set).
- STAGED: queries.py::_STAGED entries ready to move to @register.

Usage: python scripts/plan_window.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    src = (REPO / "goetl_spark" / "queries.py").read_text()
    window = re.findall(
        r'"(q[^"]+)"',
        re.search(r"_WINDOW: list\[str\] = \[(.*?)\]", src, re.S).group(1))
    registry = re.findall(r'@register\(\s*\n?\s*"(q[^"]+)"', src)
    staged = re.findall(r'@register_staged\(\s*\n?\s*"(q[^"]+)"', src)

    arts: dict[int, set[str]] = {}
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        try:
            arts[rnd] = set(json.load(open(f)))
        except (json.JSONDecodeError, AttributeError):
            continue
    if not arts:
        print("no CORRECTNESS artifacts; seat anything")
        return
    latest = max(arts)

    def num(q: str) -> int:
        return int(re.match(r"q(\d+)", q).group(1))

    # after the upcoming round, its window becomes round latest+1's rows
    upcoming = {latest + 1: set(window), **arts}
    nxt = latest + 2  # the round being planned
    recent = set().union(*(upcoming.get(r, set())
                           for r in (nxt - 1, nxt - 2, nxt - 3, nxt - 4)))
    mandatory = sorted((q for q in registry if q not in recent), key=num)
    # seat-now-or-mandatory-next: newest row would be exactly at the edge
    edge = set().union(*(upcoming.get(r, set())
                         for r in (nxt - 1, nxt - 2, nxt - 3)))
    expiring = sorted((q for q in registry
                       if q not in edge and q not in mandatory), key=num)

    seats = len(mandatory) + len(expiring) + len(staged)
    print(f"registry {len(registry)} live + {len(staged)} staged; "
          f"planning round r{nxt} (assumes r{nxt - 1} records the "
          f"current window)")
    print(f"\nHARD-mandatory ({len(mandatory)}): "
          + ", ".join(q.split("_")[0] for q in mandatory))
    print(f"\nEXPIRING next round ({len(expiring)}): "
          + ", ".join(q.split("_")[0] for q in expiring))
    print(f"\nSTAGED to register+seat ({len(staged)}): "
          + ", ".join(q.split("_")[0] for q in staged))
    print(f"\ntotal suggested seats: {seats} of 50 "
          f"({50 - seats:+d} spare)" if seats <= 50 else
          f"\nOVER CAPACITY: {seats} > 50 — deferring "
          f"{seats - 50} STAGED entries (staged never expire; expiring "
          f"entries become hard next round, so they keep their seats)")

    # paste-ready window: mandatory + expiring first (they have
    # deadlines), then staged up to capacity — highest-q staged defer
    # to the following round
    seated_staged = staged[:max(0, 50 - len(mandatory) - len(expiring))]
    proposal = sorted(mandatory + expiring, key=num) \
        + sorted(seated_staged, key=num)
    deferred = [q for q in staged if q not in seated_staged]
    print("\nproposed _WINDOW (paste into queries.py; move seated "
          "staged entries from @register_staged to @register):")
    for q in proposal:
        print(f'    "{q}",')
    if deferred:
        print(f"# deferred staged (stay in _STAGED): "
              + ", ".join(q.split("_")[0] for q in deferred))


if __name__ == "__main__":
    main()
