"""Regenerate QUERIES.md (the registry index) from plans/queries.py
docstrings — one row per registered query: name, oracle coverage, first
docstring line — and rewrite the README's registry-count span (the text
between the ``<!-- registry-count -->`` markers) so the count is always
generated, never hand-written (a hand-edited number went stale twice).
Run after any registration change:

    python tools/regen_queries_md.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEADER = """# Query registry index

Generated from `plans/queries.py` docstrings — one row per registered
`queries()` entry. Every query has a DuckDB oracle (full value-hash
check in the driver gate). Regenerate with
`python tools/regen_queries_md.py` if the registry changes.

| Query | Oracle | Summary |
|---|---|---|
"""


def main() -> None:
    from py_data_pipeline_app_spark.plans.queries import ORACLES, QUERIES

    lines = []
    for name in sorted(QUERIES):
        doc = (QUERIES[name].__doc__ or "").strip().splitlines()[0].strip()
        oracle = "yes" if name in ORACLES else "rows-only"
        lines.append(f"| `{name}` | {oracle} | {doc[:64].rstrip()} |")
    out = os.path.join(REPO, "QUERIES.md")
    with open(out, "w") as f:
        f.write(HEADER + "\n".join(lines) + "\n")
    print(f"wrote {out}: {len(lines)} queries, "
          f"{sum(1 for n in QUERIES if n in ORACLES)} oracle-backed")

    from py_data_pipeline_app_spark.plans.queries import RETIRED_QUERIES

    n, n_oracle = len(QUERIES), sum(1 for q in QUERIES if q in ORACLES)
    spans = {
        "registry-count": (
            f"{n} registered queries, {n_oracle}/{n} with full DuckDB "
            "value-hash oracles"
        ),
        "registry-headroom": (
            f"N = {n} registered (+{len(RETIRED_QUERIES)} retired), "
            f"headroom for {100 - n} more"
        ),
    }
    bench = _latest_bench()
    if bench is not None:
        rnd, total = bench
        spans["bench-band"] = f"{total:.0f} s measured in round {rnd}"
    readme = os.path.join(REPO, "README.md")
    with open(readme) as f:
        text = f.read()
    for key, span in spans.items():
        start, end = f"<!-- {key} -->", f"<!-- /{key} -->"
        if start in text and end in text:
            head, rest = text.split(start, 1)
            _, tail = rest.split(end, 1)
            text = head + start + span + end + tail
            print(f"patched README {key} span: {span}")
        else:
            print(f"README {key} markers missing - not patched")
    with open(readme, "w") as f:
        f.write(text)


def _latest_bench() -> tuple[int, float] | None:
    """(round, total seconds) from the newest committed BENCH_r*.json —
    the source for the README's bench-band span, so the stated number
    is always a driver measurement, never a hand-written claim."""
    import glob
    import json
    import re

    best = None
    for path in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        # The driver wraps bench.py's JSON line: the total lives at
        # parsed.value (top-level keys are n/rc/cpus/tail/parsed).
        total = (data.get("parsed") or {}).get("value")
        if isinstance(total, (int, float)) and (
            best is None or int(m.group(1)) > best[0]
        ):
            best = (int(m.group(1)), float(total))
    if best is None:
        print(
            "WARNING: no BENCH_r*.json parsed - README bench-band span "
            "left stale",
            file=sys.stderr,
        )
    return best


if __name__ == "__main__":
    main()
