"""Bench output contract: the driver captures only the last ~2000
characters of bench.py stdout and parses the FINAL line. Round 8 lost
37 query timings because the single full-name JSON line outgrew that
window (BENCH_r08.json: parsed=null). These tests pin the fix: the
aliased metric line printed last must stay under the capture window
for the whole registry, and the alias table must stay a bijection
covering exactly the registered queries.
"""

from __future__ import annotations

import importlib.util
import json
import os

from py_data_pipeline_app_spark.plans.queries import QUERIES, RETIRED_QUERIES

_REPO = os.path.join(os.path.dirname(__file__), "..")


def _bench():
    spec = importlib.util.spec_from_file_location(
        "_bench_under_test", os.path.join(_REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_aliases_cover_registry_exactly():
    bench = _bench()
    assert set(bench.ALIASES) == set(QUERIES), (
        "every registered query needs a bench alias (and no stale ones): "
        f"missing={sorted(set(QUERIES) - set(bench.ALIASES))} "
        f"stale={sorted(set(bench.ALIASES) - set(QUERIES))}"
    )


def test_retired_tracked_rows_are_retired_and_disjoint():
    """Retired-tracked bench rows must come from the RETIRED registry
    (their oracle runs in tests/test_retired.py), never shadow a
    registered row, and never collide with a registered alias — the
    rotation ledger lives in ROTATION.md."""
    bench = _bench()
    assert set(bench.RETIRED_TRACKED) <= set(RETIRED_QUERIES)
    assert not (set(bench.RETIRED_TRACKED) & set(bench.ALIASES))
    assert not (
        set(bench.RETIRED_TRACKED.values()) & set(bench.ALIASES.values())
    )


def test_aliases_unique_and_short():
    bench = _bench()
    shorts = list(bench.ALIASES.values()) + list(
        bench.RETIRED_TRACKED.values()
    )
    assert len(shorts) == len(set(shorts)), "alias collisions"
    assert all(len(s) <= 12 for s in shorts)


def test_metric_line_fits_capture_window():
    bench = _bench()
    # worst case: every query at a 5-char timing (e.g. 123.4 / 0.123)
    # — including the retired-tracked rows the metric line also carries
    compact = {
        a: 123.4
        for a in list(bench.ALIASES.values())
        + list(bench.RETIRED_TRACKED.values())
    }
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": 12345.678,
            "unit": "sec",
            "sf": 0.1,
            # worst-case noise metadata (round 14: host-drift
            # visibility; abbreviated keys — the full-name line and
            # bench.py's docstring carry the decode)
            "env": {"lb": 123.45, "la": 123.45, "ctl": -123.4},
            "queries": compact,
        },
        separators=(",", ":"),
    )
    # the driver's capture window is ~2000 chars; 1900 keeps real
    # margin while admitting the retired-tracked row (worst case is
    # every timing at 5 chars — the real r15 line was 1743 chars)
    assert len(line) < 1900, f"metric line {len(line)} chars risks truncation"


def test_noise_metadata_contract():
    """The round-13 verdict's #4: BENCH artifacts must carry enough
    environment metadata to adjudicate host noise without judge-side
    A/B reruns — loadavg before/after plus a control-rerun delta. Pin
    the machinery: control set is the first three headline queries
    (timed first, re-timed last, maximizing the drift window) and the
    loadavg probe returns a rounded float."""
    bench = _bench()
    assert bench.CONTROLS == bench.HEADLINE[:3]
    assert len(bench.CONTROLS) == 3
    la = bench._loadavg()
    assert la is None or (isinstance(la, float) and la >= 0.0)


def test_sig3():
    bench = _bench()
    assert bench.sig3(0.8391) == 0.839
    assert bench.sig3(3.132) == 3.13
    assert bench.sig3(10.012) == 10.0
    assert bench.sig3(123.456) == 123.0
    assert bench.sig3(0.0) == 0.0
