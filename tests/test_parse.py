"""P1/P2 blob-parser unit + property tests (SURVEY.md §5.2.3-4).

Contract (reference app.py:93-104): a line either parses to exactly 6
fields or lands in the rejects channel — never crashes, never truncates.
"""

import pytest
from pyspark.sql import Row

from py_data_pipeline_app_spark.operators.parse import parse_customer_blob


def _parse(spark, lines):
    raw = spark.createDataFrame(
        [Row(raw=x, _sheet_pos=i) for i, x in enumerate(lines)],
        "raw string, _sheet_pos long",
    )
    parsed, rejects = parse_customer_blob(raw)
    return parsed.collect(), rejects.collect()


def test_happy_path(spark):
    parsed, rejects = _parse(
        spark,
        ["{C0001_Allison Hill_jill@miller.com_1975-05-15_908 Jennifer Squares, Sydney NSW 71927_43899.6575694444}"],
    )
    assert rejects == []
    r = parsed[0]
    assert r.customer_id == "C0001"
    assert r.name == "Allison Hill"
    assert r.email == "jill@miller.com"
    assert r.dob == "1975-05-15"
    assert r.address == "908 Jennifer Squares, Sydney NSW 71927"
    assert r.created_date == "43899.6575694444"
    assert r._sheet_pos == 0


def test_maxsplit_keeps_trailing_underscores_in_created_date(spark):
    # split('_', 5) semantics: underscores past the 5th separator stay in
    # the last field (reference app.py:100).
    parsed, rejects = _parse(spark, ["{a_b_c_d_e_f_g_h}"])
    assert rejects == []
    assert parsed[0].created_date == "f_g_h"


def test_whitespace_stripped_before_brace_check(spark):
    parsed, rejects = _parse(spark, ["   {a_b_c_d_e_f}  "])
    assert rejects == [] and parsed[0].customer_id == "a"


@pytest.mark.parametrize(
    "line,reason",
    [
        ("no braces at all", "not_braced"),
        ("{missing_close", "not_braced"),
        ("missing_open}", "not_braced"),
        ("{too_few_fields}", "wrong_field_count"),
        ("{a_b_c_d_e}", "wrong_field_count"),  # 5 fields
        ("", "not_braced"),
    ],
)
def test_rejects(spark, line, reason):
    parsed, rejects = _parse(spark, [line])
    assert parsed == []
    assert len(rejects) == 1 and rejects[0].reject_reason == reason


def test_totality(spark):
    # every input row lands in exactly one channel
    lines = ["{a_b_c_d_e_f}", "junk", "{x_y}", "  {1_2_3_4_5_6}  ", "{}"]
    parsed, rejects = _parse(spark, lines)
    assert len(parsed) + len(rejects) == len(lines)
    assert len(parsed) == 2
