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
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _decode_aliases(queries: dict[str, float]) -> dict[str, float]:
    """BENCH_r09+ metric lines key queries by their short alias
    (bench.py ALIASES) so the line fits the driver's ~2000-char tail
    capture; decode back to full registry names when so."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_bench_aliases",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    inverse = {short: full for full, short in mod.ALIASES.items()}
    if sum(k in inverse for k in queries) > len(queries) / 2:
        return {inverse.get(k, k): v for k, v in queries.items()}
    return queries


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
    except ValueError:
        # bench.py now prints two JSON lines (full-name first, aliased
        # metric line last): prefer the full-name line
        d = None
        for line in text.splitlines():
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                cand = json.loads(line)
            except ValueError:
                continue
            if "queries" in cand:
                d = cand
                if cand.get("metric") == "headline_queries_total_fullnames":
                    break
        if d is None:
            raise SystemExit(f"{path}: no parseable 'queries' line found")
    if "queries" in d:
        return _decode_aliases(d["queries"])
    if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
        return _decode_aliases(d["parsed"]["queries"])  # driver wrapper
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
