#!/usr/bin/env python
"""Recompute the perf-weak set from a committed bench detail file —
the auditability tool the r12 verdict asked for (item 2): the rule's
every input (per-query walls, floors, plan-build times, same-run
DuckDB twins) lives in ONE BENCH_DETAIL_r{N}.json, and this script is
the single mechanical reading of it, so the round's perf-weak count is
recomputable from committed artifacts alone:

    python scripts/perf_weak.py BENCH_DETAIL_r13.json

The rule (unchanged since r11, stated in SCALE.md): a query is
perf-weak when its wall net of the measured fixed components —
net = wall − floor(sf0.001 shape cost) − plan_build — exceeds BOTH
2× its same-run DuckDB oracle wall AND the 0.25 s materiality floor.
Verified against the r12 record: this script on BENCH_DETAIL_r12.json
prints exactly the nine queries SCALE.md §Round-12 lists.
"""

from __future__ import annotations

import json
import sys

NET_FLOOR_SEC = 0.25
DUCK_RATIO = 2.0


def perf_weak(detail: dict) -> list[tuple[str, float, float, float]]:
    """[(name, net_sec, duck_sec, net/duck)] sorted by net desc."""
    walls = detail["queries"]
    floors = detail.get("floor_sec", {})
    builds = detail.get("build_sec", {})
    duck = detail.get("duckdb_queries", {})
    out = []
    for name, wall in walls.items():
        d = duck.get(name)
        if not isinstance(d, (int, float)):
            continue  # oracle error marker — no comparator this run
        net = wall - (floors.get(name) or 0.0) - (builds.get(name) or 0.0)
        # strictly-greater: the documented rule says net must EXCEED the
        # materiality floor, so exactly 0.250 s is not perf-weak
        # (r13 ADVICE boundary fix)
        if net > NET_FLOOR_SEC and net > DUCK_RATIO * d:
            # d == 0 (a sub-resolution oracle wall) still satisfies the
            # rule; report an infinite ratio instead of dividing by it
            ratio = round(net / d, 2) if d > 0 else float("inf")
            out.append((name, round(net, 3), round(d, 3), ratio))
    return sorted(out, key=lambda t: -t[1])


def main(argv: list[str]) -> int:
    if len(argv) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    with open(argv[1]) as f:
        detail = json.load(f)
    rows = perf_weak(detail)
    print(
        f"# {argv[1]}: spread={detail.get('max_rel_spread')} "
        f"total={detail.get('value')}s duckdb={detail.get('duckdb_total')}s"
    )
    print(f"# perf-weak (net > {NET_FLOOR_SEC}s and net > {DUCK_RATIO}x "
          f"same-run duckdb): {len(rows)}")
    for name, net, d, ratio in rows:
        print(f"{name:28s} net={net:6.3f}s  duckdb={d:6.3f}s  {ratio:5.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
