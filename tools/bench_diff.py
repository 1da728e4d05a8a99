"""Diff two bench result files (BENCH_DETAIL.json format).

Prints per-query deltas sorted by absolute change, flagging
regressions beyond both a ratio and an absolute floor (iterative
queries carry ~15% run-to-run variance on local[32], so small
absolute drifts are noise).

Usage: python tools/bench_diff.py OLD.json NEW.json [--warm|--cold]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    which = "cold_queries" if "--cold" in sys.argv else "queries"
    if len(args) != 2:
        print(__doc__)
        raise SystemExit(2)
    old = json.load(open(args[0]))[which]
    new = json.load(open(args[1]))[which]
    rows = []
    for k in sorted(set(old) | set(new)):
        o, n = old.get(k), new.get(k)
        if o is None or n is None:
            rows.append((float("inf"), k, o, n, "ADDED" if o is None else "REMOVED"))
            continue
        flag = ""
        if n > o * 1.5 and n - o > 0.5:
            flag = "REGRESSION"
        elif n < o * 0.67 and o - n > 0.5:
            flag = "win"
        rows.append((abs(n - o), k, o, n, flag))
    rows.sort(reverse=True)
    for _, k, o, n, flag in rows[:25]:
        os = "  —  " if o is None else f"{o:5.2f}"
        ns = "  —  " if n is None else f"{n:5.2f}"
        print(f"{k:38s} {os} -> {ns}  {flag}")
    t_old = sum(v for v in old.values())
    t_new = sum(v for v in new.values())
    print(f"\n{'TOTAL':38s} {t_old:5.1f} -> {t_new:5.1f}")


if __name__ == "__main__":
    main()
