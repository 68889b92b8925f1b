"""Round-8 relational-shape queries: pivot (wide language-mix matrix)
and anti-join with a scalar-aggregate cutoff (TPC-H Q22 shape)."""

import contextlib
import io

from pyspark.sql import functions as F

from py_data_pipeline_app_spark.plans.queries import QUERIES
from py_data_pipeline_app_spark.sources.parquet import load_table

LANGS = ["de", "en", "es", "fr", "zh"]


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# source_lang_pivot
# ---------------------------------------------------------------------------


def test_pivot_matrix_is_dense_and_mass_preserving(spark, sf_dir):
    out = QUERIES["source_lang_pivot"](spark, sf_dir)
    assert out.columns == ["source"] + LANGS
    rows = out.collect()
    docs = load_table(spark, "documents", sf_dir)
    # pinned pivot values cover the whole corpus here, so the matrix
    # must be dense (no null cells) and its mass must equal the corpus
    assert all(getattr(r, lg) is not None for r in rows for lg in LANGS)
    assert sum(sum(getattr(r, lg) for lg in LANGS) for r in rows) == docs.count()
    assert {r.source for r in rows} == {
        r.source for r in docs.select("source").distinct().collect()
    }


def test_pivot_cell_matches_direct_count(spark, sf_dir):
    out = {r.source: r for r in QUERIES["source_lang_pivot"](spark, sf_dir).collect()}
    docs = load_table(spark, "documents", sf_dir)
    direct = {
        (r.source, r.lang): r["cnt"]
        for r in docs.groupBy("source", "lang").agg(F.count("*").alias("cnt")).collect()
    }
    for (src, lang), n in direct.items():
        assert getattr(out[src], lang) == n
    # and absent combinations really are zero, not null
    for src, row in out.items():
        for lg in LANGS:
            if (src, lg) not in direct:
                assert getattr(row, lg) == 0


def test_pivot_is_single_shuffle(spark, sf_dir):
    """Conditional-aggregate pivot expansion ⇒ one hash agg on source:
    exactly one Exchange (a ``.pivot()`` call would plan two), and no
    separate distinct-discovery job in the plan."""
    plan = plan_of(QUERIES["source_lang_pivot"](spark, sf_dir), mode="simple")
    assert plan.count("Exchange") == 1


# ---------------------------------------------------------------------------
# churned_high_balance_customers
# ---------------------------------------------------------------------------


def test_churned_matches_left_join_formulation(spark, sf_dir):
    out = {
        r.c_mktsegment: r
        for r in QUERIES["churned_high_balance_customers"](spark, sf_dir).collect()
    }
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cut = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
                / F.count("c_acctbal")
            ).alias("m")
        )
        .collect()[0]
        .m
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select(F.col("o_custkey").alias("k"))
    # independent formulation: left join + null filter instead of anti
    expected = {
        r.c_mktsegment: (r.n, float(r.bal))
        for r in (
            cust.filter(F.col("c_acctbal") > cut)
            .join(recent.distinct(), F.col("c_custkey") == F.col("k"), "left")
            .filter(F.col("k").isNull())
            .groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum(F.col("c_acctbal").cast("decimal(18,6)")), 2).alias(
                    "bal"
                ),
            )
            .collect()
        )
    }
    assert {s: (r.n_customers, r.total_balance) for s, r in out.items()} == expected
    assert expected  # non-vacuous at sf0.001


def test_churned_plan_pushes_date_filter_and_avoids_cartesian(spark, sf_dir):
    plan = plan_of(QUERIES["churned_high_balance_customers"](spark, sf_dir))
    # the date predicate reaches the orders parquet scan on the anti side
    assert "GreaterThanOrEqual(o_orderdate" in plan
    assert "LeftAnti" in plan
    # the one-row cutoff enters via broadcast, never a plain cartesian
    assert "CartesianProduct" not in plan
