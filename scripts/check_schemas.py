#!/usr/bin/env python3
"""Diff /root/testdata parquet schemas against the pinned manifest.

The round-4 bench died because the driver silently regenerated
``events.parquet`` with ``ts`` as timestamp[us] instead of int64-nanos
(see BENCHNOTES.md).  This script is the round-start guard: it reads
``pyarrow.parquet.read_schema`` for every table at every scale factor
and diffs (column name, arrow type) pairs against
``scripts/schema_manifest.json``.

Usage:
    python scripts/check_schemas.py              # check, exit 1 on drift
    python scripts/check_schemas.py --pin        # rewrite the manifest

Any deviation is printed one line per (sf, table, column) so the fix
(usually: extend the dtype sniffing in queries.py/session.py) can be
targeted before the bench or the oracle gate runs.
"""
from __future__ import annotations

import json
import os
import sys

import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SFS = ["sf0.001", "sf0.01", "sf0.1"]
ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
MANIFEST = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "schema_manifest.json")


def snapshot() -> dict:
    out = {}
    for sf in SFS:
        d = os.path.join(ROOT, sf)
        if not os.path.isdir(d):
            continue
        for t in TABLES:
            p = os.path.join(d, f"{t}.parquet")
            if not os.path.exists(p):
                out[f"{sf}/{t}"] = None
                continue
            s = pq.read_schema(p)
            out[f"{sf}/{t}"] = [[n, str(ty)] for n, ty in zip(s.names, s.types)]
    return out


def main() -> int:
    cur = snapshot()
    if "--pin" in sys.argv:
        with open(MANIFEST, "w") as f:
            json.dump(cur, f, indent=1, sort_keys=True)
        print(f"pinned {len(cur)} table schemas -> {MANIFEST}")
        return 0
    if not os.path.exists(MANIFEST):
        print(f"no manifest at {MANIFEST}; run with --pin first", file=sys.stderr)
        return 2
    with open(MANIFEST) as f:
        pinned = json.load(f)
    drift = 0
    for key in sorted(set(pinned) | set(cur)):
        a, b = pinned.get(key), cur.get(key)
        if a == b:
            continue
        if a is None or b is None:
            print(f"DRIFT {key}: {'added' if a is None else 'removed'}")
            drift += 1
            continue
        an, bn = dict(a), dict(b)
        col_drift = 0
        for col in sorted(set(an) | set(bn)):
            if an.get(col) != bn.get(col):
                print(f"DRIFT {key}.{col}: pinned={an.get(col)!r} now={bn.get(col)!r}")
                drift += 1
                col_drift += 1
        if not col_drift:
            # a != b with identical (name -> type) maps means the COLUMN
            # ORDER changed (or a name is duplicated) — still drift: the
            # whole point is catching silent testdata regeneration
            print(f"DRIFT {key}: column order changed "
                  f"(pinned={[c for c, _ in a]} now={[c for c, _ in b]})")
            drift += 1
    if drift:
        print(f"{drift} schema deviations vs {MANIFEST}")
        return 1
    print(f"OK: {len(cur)} table schemas match the pinned manifest")
    return 0


if __name__ == "__main__":
    sys.exit(main())
