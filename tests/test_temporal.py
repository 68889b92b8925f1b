"""As-of join (operators/temporal.py): semantics vs pandas merge_asof,
tie handling, tolerance, and no-match nulls."""

from datetime import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from py_data_pipeline_app_spark.functions.frames import local_rows_df
from py_data_pipeline_app_spark.operators.temporal import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = local_rows_df(
        spark,
        "event_id long, user_id long, ts timestamp",
        [
            (101, 1, _ts("2024-01-01T10:00:00")),
            (102, 1, _ts("2024-01-01T12:00:00")),
            (103, 2, _ts("2024-01-01T09:00:00")),  # before any right row
            (104, 3, _ts("2024-01-01T11:00:00")),  # user with no right rows
        ]
    )
    right = local_rows_df(
        spark,
        "event_id long, user_id long, ts timestamp",
        [
            (1, 1, _ts("2024-01-01T09:30:00")),
            (2, 1, _ts("2024-01-01T10:00:00")),  # exactly at left 101 -> matches
            (3, 1, _ts("2024-01-01T11:59:00")),
            (4, 2, _ts("2024-01-01T09:30:00")),
        ]
    )
    return left, right


def test_asof_backward_semantics(frames):
    left, right = frames
    out = {
        r.event_id: r
        for r in asof_join(
            left, right, on="user_id", right_payload=["event_id"]
        ).collect()
    }
    assert out[101].asof_event_id == 2  # equal-ts right row matches
    assert out[102].asof_event_id == 3
    assert out[103].asof_event_id is None  # left precedes all right rows
    assert out[104].asof_event_id is None  # key has no right rows
    assert len(out) == 4  # every left row survives


def test_asof_matches_pandas_merge_asof(frames):
    left, right = frames
    got = (
        asof_join(left, right, on="user_id", right_payload=["event_id"])
        .orderBy("event_id")
        .toPandas()
    )
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts").rename(columns={"event_id": "r_eid"})
    exp = (
        pd.merge_asof(lp, rp, on="ts", by="user_id", direction="backward")
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(got["asof_event_id"].fillna(-1)) == list(exp["r_eid"].fillna(-1))


def test_asof_tolerance(frames):
    left, right = frames
    out = {
        r.event_id: r
        for r in asof_join(
            left,
            right,
            on="user_id",
            right_payload=["event_id"],
            tolerance_seconds=120,
        ).collect()
    }
    assert out[101].asof_event_id == 2  # 0s gap, inside tolerance
    assert out[102].asof_event_id == 3  # 60s gap
    # 103/104 had no match anyway
    assert out[103].asof_event_id is None


def test_asof_plan_has_no_join(frames, spark):
    # multi-partition inputs via createDataFrame's parallelize path: the
    # JVM-literal fixtures are single-partition, which trivially
    # satisfies the window's clustering and hides the keyed Exchange
    # this test exists to count
    left, right = (
        spark.createDataFrame(df.collect(), df.schema) for df in frames
    )
    import io, contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join(left, right, on="user_id", right_payload=["event_id"]).explain(
            "formatted"
        )
    plan = buf.getvalue()
    assert "Join" not in plan  # union + window, never a join node
    # exactly one shuffle on the key (tree section lists "Exchange (N)")
    assert plan.count("Exchange (") == 1


# ---------------------------------------------------------------------------
# forward / nearest directions (pandas merge_asof parity)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _compare_direction(spark, left_rows, right_rows, direction, tol):
    import pandas as pd

    left = local_rows_df(
        spark, "event_id long, user_id long, ts timestamp", left_rows
    )
    right = local_rows_df(
        spark, "event_id long, user_id long, ts timestamp", right_rows
    )
    got = (
        asof_join(
            left,
            right,
            on="user_id",
            right_payload=["event_id"],
            direction=direction,
            tolerance_seconds=tol,
        )
        .orderBy("event_id")
        .toPandas()
    )
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("ts").rename(columns={"event_id": "r_eid"})
    kwargs = {}
    if tol is not None:
        kwargs["tolerance"] = pd.Timedelta(seconds=tol)
    exp = (
        pd.merge_asof(lp, rp, on="ts", by="user_id", direction=direction, **kwargs)
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(got["asof_event_id"].fillna(-1)) == list(exp["r_eid"].fillna(-1)), (
        direction,
        tol,
        left_rows,
        right_rows,
    )


@settings(max_examples=6, deadline=None)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500)),  # (user, offset s)
        min_size=1,
        max_size=12,
        unique=True,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500)),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t,  # unique (user, ts): no right-side ties
    ),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tol=st.sampled_from([None, 60, 200]),
)
def test_asof_directions_match_pandas(spark, lefts, rights, direction, tol):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    # unique (user, ts) on the right avoids tie-order ambiguity between
    # pandas' positional tie-break and our id-ordered one
    rights = list({(u, s): None for u, s in rights}.keys())
    left_rows = [
        (i, u, base + timedelta(seconds=s)) for i, (u, s) in enumerate(lefts)
    ]
    right_rows = [
        (100 + i, u, base + timedelta(seconds=s))
        for i, (u, s) in enumerate(rights)
    ]
    _compare_direction(spark, left_rows, right_rows, direction, tol)


def test_asof_nearest_tie_goes_backward(spark):
    from datetime import datetime

    left = local_rows_df(
        spark,
        "event_id long, user_id long, ts timestamp",
        [(1, 7, datetime(2024, 1, 1, 10, 0, 0))]
    )
    right = local_rows_df(
        spark,
        "event_id long, user_id long, ts timestamp",
        [
            (101, 7, datetime(2024, 1, 1, 9, 59, 0)),  # 60s before
            (102, 7, datetime(2024, 1, 1, 10, 1, 0)),  # 60s after
        ]
    )
    out = asof_join(
        left, right, on="user_id", right_payload=["event_id"], direction="nearest"
    ).collect()
    assert out[0].asof_event_id == 101  # exact tie -> backward, pandas-style


def test_asof_rejects_bad_direction(frames):
    left, right = frames
    import pytest

    with pytest.raises(ValueError, match="direction"):
        asof_join(
            left, right, on="user_id", right_payload=["event_id"], direction="up"
        )
