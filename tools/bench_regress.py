"""Executable form of the BASELINE.md bench hold ("within 2x of
BASELINE at the same scale factor").

Compares a fresh BENCH_FULL.json against the committed per-query
baseline BENCH_BASELINE.json (first full-registry measurement, sf0.1,
local[32]; BENCH_r01's parsed line predates the full registry and only
covered 40 queries). Queries new since the baseline are reported as
"new" and appended on --update so every entry acquires a baseline the
round it ships.

Usage: python tools/bench_regress.py [--threshold 2.0] [--update]
Exit 1 if any common query exceeds threshold x its baseline.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FULL = os.path.join(HERE, "BENCH_FULL.json")
BASE = os.path.join(HERE, "BENCH_BASELINE.json")


def main() -> int:
    threshold = 2.0
    update = "--update" in sys.argv
    if "--threshold" in sys.argv:
        threshold = float(sys.argv[sys.argv.index("--threshold") + 1])

    full = json.load(open(FULL))["queries"]
    base = json.load(open(BASE))["queries"] if os.path.exists(BASE) else {}

    regressions, improved, new = {}, 0, []
    for name, sec in full.items():
        if name not in base:
            new.append(name)
            continue
        ratio = sec / base[name] if base[name] > 0 else 1.0
        if ratio > threshold:
            regressions[name] = (base[name], sec, round(ratio, 2))
        elif ratio < 1.0:
            improved += 1
    for name, (b, s, r) in sorted(regressions.items(), key=lambda kv: -kv[1][2]):
        print(f"  REGRESSION {name}: {b}s -> {s}s ({r}x)")
    print(
        f"{len(full)} benched | {len(base)} baselined | {len(new)} new | "
        f"{improved} faster than baseline | {len(regressions)} over {threshold}x"
    )
    if update:
        merged = dict(base)
        for name in new:
            merged[name] = full[name]
        json.dump(
            {"queries": merged, "note": "first-measurement per-query baseline (sf0.1, local[32]); append-only via --update"},
            open(BASE, "w"), indent=1, sort_keys=True,
        )
        print(f"wrote {BASE} (+{len(new)} new baselines)")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
