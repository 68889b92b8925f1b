"""Compare two bench artifacts (bench.py output or the driver's
BENCH_r{N}.json wrapper) like-for-like: per-query deltas over the
common query set, plus what was added/removed. Round-over-round wall
times drift for queries that exist in only one run, so raw totals
mislead — this prints the honest comparison.

Usage:
    python tools/bench_compare.py BENCH_r07.json BENCH_r08.json
    python tools/bench_compare.py old.json new.json --top 15
"""

from __future__ import annotations

import argparse
import json


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d["queries"]
    if "parsed" in d and "queries" in d["parsed"]:  # driver wrapper
        return d["parsed"]["queries"]
    raise SystemExit(f"{path}: no 'queries' map found")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=10, help="rows per section")
    args = ap.parse_args()

    old, new = load_queries(args.old), load_queries(args.new)
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    t_old = sum(old[k] for k in common)
    t_new = sum(new[k] for k in common)
    pct = (t_new - t_old) / t_old * 100 if t_old else 0.0
    print(
        f"like-for-like ({len(common)} queries): "
        f"{t_old:.2f}s -> {t_new:.2f}s ({pct:+.1f}%)"
    )
    if added:
        print(f"added ({len(added)}): {sum(new[k] for k in added):.2f}s total")
    if removed:
        print(f"removed ({len(removed)}): {sum(old[k] for k in removed):.2f}s total")

    deltas = sorted(common, key=lambda k: new[k] - old[k])
    print(f"\nbiggest improvements (of {args.top}):")
    for k in deltas[: args.top]:
        d = new[k] - old[k]
        if d >= 0:
            break
        print(f"  {old[k]:7.2f} -> {new[k]:7.2f}  ({d:+.2f})  {k}")
    regressions = [k for k in reversed(deltas) if new[k] - old[k] > 0.05]
    print(f"\nregressions > 0.05s ({len(regressions)}):")
    for k in regressions[: args.top]:
        d = new[k] - old[k]
        print(f"  {old[k]:7.2f} -> {new[k]:7.2f}  ({d:+.2f})  {k}")


if __name__ == "__main__":
    main()
