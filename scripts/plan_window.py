"""Compute the next round's _WINDOW seat plan from the artifacts.

The seat math drifted twice when done by hand (r6 verdict "What's
wrong" #2); this derives it mechanically from the same inputs
tests/test_registry.py enforces:

- HARD-mandatory: registered queries with no row in the last FIVE
  recorded CORRECTNESS rounds (they fail the staleness test if
  unseated; budget widened 4->5 at round 11, see
  tests/test_registry.py docstring).
- EXPIRING-next: queries whose newest row is exactly five rounds old
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
    recent = set().union(*(upcoming.get(nxt - i, set())
                           for i in range(1, 6)))
    mandatory = sorted((q for q in registry if q not in recent), key=num)
    # seat-now-or-mandatory-next: newest row would be exactly at the edge
    edge = set().union(*(upcoming.get(nxt - i, set())
                         for i in range(1, 5)))
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
    if seats <= 50:
        print(f"\ntotal suggested seats: {seats} of 50 "
              f"({50 - seats:+d} spare)")
    else:
        print(f"\nOVER CAPACITY: {seats} > 50 — deferring "
              f"{seats - 50} EXPIRING entries (staged queries have never "
              f"had a driver row, so they seat first; deferred expiring "
              f"entries become hard-mandatory next round, which is "
              f"recoverable as long as mandatory+staged fits)")

    # paste-ready window, priority order (r7 verdict: a staged query
    # without a driver row is the judge's top gap, so staged outrank
    # expiring): 1. mandatory (staleness test fails otherwise),
    # 2. staged, 3. expiring oldest-first to fill. Always capped at 50 —
    # an over-50 proposal would fail test_registry's seat cap.
    seated: list[str] = list(mandatory[:50])
    seated += staged[:max(0, 50 - len(seated))]
    seated += expiring[:max(0, 50 - len(seated))]
    proposal = sorted((q for q in seated if q not in staged), key=num) \
        + sorted((q for q in seated if q in staged), key=num)
    print("\nproposed _WINDOW (paste into queries.py; move seated "
          "staged entries from @register_staged to @register):")
    for q in proposal:
        print(f'    "{q}",')
    for label, pool in (("MANDATORY (INVALID — shrink the registry or "
                         "widen the budget)", mandatory),
                        ("staged (stay in _STAGED)", staged),
                        ("expiring (hard-mandatory next round)", expiring)):
        dropped = [q for q in pool if q not in seated]
        if dropped:
            print(f"# unseated {label}: "
                  + ", ".join(q.split("_")[0] for q in dropped))


if __name__ == "__main__":
    main()
