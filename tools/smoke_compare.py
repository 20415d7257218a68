"""Cross-round smoke ratio table (r13 verdict #6: 'green artifacts,
cross-round ratio table, any new defect fixed in-round').

Compares two smoke_all.py artifacts (same sf), printing error rows,
the median ratio, and the tail movers.  A smoke number is a CANDIDATE
flag, never regression evidence by itself (session-cold caveat,
SURVEY §7.-5) — movers here feed tools/ab_compare.py.

Usage: python tools/smoke_compare.py OLD.json NEW.json [ratio_floor]
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    old = json.load(open(sys.argv[1]))["per_query_sec_or_err"]
    new = json.load(open(sys.argv[2]))["per_query_sec_or_err"]
    floor = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    errs = {n: v for n, v in new.items() if not isinstance(v, (int, float))}
    if errs:
        print("ERRORS:")
        for n, v in errs.items():
            print(f"  {n}: {v}")
    both = {
        n: (old[n], new[n])
        for n in new
        if isinstance(new[n], (int, float))
        and isinstance(old.get(n), (int, float))
        and old[n] >= 0.3
    }
    rats = sorted(
        ((b / a, n, a, b) for n, (a, b) in both.items()), reverse=True
    )
    if not rats:
        # nothing comparable (all-new errors, or every old time < 0.3 s):
        # the error summary above is the whole report — don't crash on
        # an empty median (r14 ADVICE, low).
        print("0 comparable queries; no ratio table")
        return
    med = statistics.median(r for r, *_ in rats)
    print(f"{len(both)} comparable, median ratio new/old = {med:.3f}")
    movers = [(r, n, a, b) for r, n, a, b in rats if r >= floor * med]
    print(f"movers >= {floor}x median:")
    for r, n, a, b in movers:
        print(f"  {r:5.2f}  {n}  {a:.2f} -> {b:.2f}")
    fast = [(r, n, a, b) for r, n, a, b in rats if r <= med / floor]
    print("improved (<= median/floor):")
    for r, n, a, b in fast[-10:]:
        print(f"  {r:5.2f}  {n}  {a:.2f} -> {b:.2f}")


if __name__ == "__main__":
    main()
