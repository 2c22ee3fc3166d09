"""Diff two bench spread files (BENCH_DETAIL.json shape): per-query
median delta with overlap adjudication.

A mover is REAL only if the [min..max] spreads do not overlap (the
repo's standing non-overlapping-spread rule); everything else is
session noise. Prints regressions first, then wins, then the totals.

Usage: python tools/bench_diff.py BEFORE.json AFTER.json [min_abs_delta]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    before = json.load(open(sys.argv[1]))
    after = json.load(open(sys.argv[2]))
    min_abs = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    sb, sa = before.get("spread", {}), after.get("spread", {})
    qb, qa = before["queries"], after["queries"]
    rows = []
    for name in sorted(set(qb) & set(qa)):
        b, a = qb[name], qa[name]
        if b < 0 or a < 0:
            rows.append((name, b, a, "FAILED", 0.0))
            continue
        delta = a - b
        if abs(delta) < min_abs:
            continue
        bs, as_ = sb.get(name), sa.get(name)
        if bs is None or as_ is None:
            # a mover without spread data can't be adjudicated — don't
            # overstate it as REAL (round-12 ADVICE fix)
            rows.append((name, b, a, "no-spread", delta))
            continue
        overlap = not (as_[0] > bs[2] or as_[2] < bs[0])
        rows.append((name, b, a, "overlap" if overlap else "REAL", delta))
    rows.sort(key=lambda r: -r[4])
    for name, b, a, verdict, delta in rows:
        print(f"{delta:+7.2f}s  {b:7.2f} -> {a:7.2f}  {verdict:7s}  {name}")
    only_after = sorted(set(qa) - set(qb))
    if only_after:
        print("new:", {n: qa[n] for n in only_after})
    tb = sum(v for v in qb.values() if v >= 0)
    ta = sum(v for v in qa.values() if v >= 0)
    common_b = sum(v for n, v in qb.items() if v >= 0 and n in qa)
    common_a = sum(v for n, v in qa.items() if v >= 0 and n in qb)
    ratio = f" ({common_a / common_b:.3f}x)" if common_b > 0 else ""
    print(
        f"total before={tb:.1f}s after={ta:.1f}s; "
        f"common {common_b:.1f} -> {common_a:.1f}{ratio}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
