"""A1-A4/W1/P6/P7 unit tests on tiny frames (SURVEY.md §5.2.4)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from py_data_pipeline_app_spark.functions.scalar import (
    excel_serial_to_date,
    excel_serial_to_timestamp,
    money_round,
    null_safe_double,
)
from py_data_pipeline_app_spark.operators.aggregates import (
    category_totals,
    customer_spend_summary,
    top_spender_per_category,
)
from py_data_pipeline_app_spark.operators.enrich import enrich_transactions


def _merged(spark):
    return spark.createDataFrame(
        [
            Row(customer_id="C1", name="A", category="X", amount="10.005"),
            Row(customer_id="C1", name="A", category="X", amount="5.00"),
            Row(customer_id="C1", name="A", category="Y", amount="garbage"),
            Row(customer_id="C2", name="B", category="X", amount="15.005"),
            Row(customer_id="C3", name="C", category="Y", amount=None),
        ]
    )


def test_null_on_error_cast_skipped_by_sum(spark):
    """P6: garbage → NULL (to_numeric coerce analog); A1: sum skips NULLs."""
    ct = category_totals(_merged(spark))
    vals = {(r.customer_id, r.category): r.amount for r in ct.collect()}
    assert vals[("C1", "X")] == 15.005
    assert vals[("C1", "Y")] is None  # only-garbage group sums to NULL
    assert vals[("C3", "Y")] is None


def test_half_even_rounding(spark):
    """P7: pandas .round(2) is banker's — 10.005→10.0 region handled via
    bround; exact-representable ties round to even."""
    df = spark.range(1).select(
        money_round(F.lit(0.125)).alias("a"),
        money_round(F.lit(0.135)).alias("b"),
        F.round(F.lit(0.125), 2).alias("half_up"),
    )
    r = df.collect()[0]
    assert r.a == 0.12 and r.b == 0.14 and r.half_up == 0.13


def test_spend_summary_rank_on_rounded_ties(spark):
    """W1: dense_rank computed AFTER rounding (app.py:140 before :141),
    so post-round ties share a rank."""
    ct = spark.createDataFrame(
        [
            Row(customer_id="C1", name="A", category="X", amount=10.001),
            Row(customer_id="C2", name="B", category="X", amount=10.002),
            Row(customer_id="C3", name="C", category="X", amount=5.0),
        ]
    )
    rows = customer_spend_summary(ct).collect()
    by_id = {r.customer_id: r for r in rows}
    assert by_id["C1"].amount == by_id["C2"].amount == 10.0
    assert by_id["C1"].rank == by_id["C2"].rank == 1
    assert by_id["C3"].rank == 2  # dense: no gap


def test_top_spender_tie_break_first_occurrence(spark):
    """A3: pandas idxmax takes the first occurrence in (customer_id,
    name, category)-sorted order ⇒ ascending customer_id tie-break."""
    ct = spark.createDataFrame(
        [
            Row(customer_id="C9", name="Z", category="X", amount=10.0),
            Row(customer_id="C1", name="A", category="X", amount=10.0),
        ]
    )
    rows = top_spender_per_category(ct).collect()
    assert len(rows) == 1 and rows[0].customer_id == "C1"


def test_enrich_inner_drops_unknown_keys_and_dedups_dim(spark):
    txn = spark.createDataFrame(
        [
            Row(transaction_id="T1", customer_id="C1", product_code="P1", amount="5"),
            Row(transaction_id="T2", customer_id="C1", product_code="P?", amount="6"),
            Row(transaction_id="T3", customer_id="C?", product_code="P1", amount="7"),
        ]
    )
    products = spark.createDataFrame([Row(product_code="P1", category="X")])
    customers = spark.createDataFrame(
        [
            Row(customer_id="C1", name="A", address="old", _sheet_pos=0),
            Row(customer_id="C1", name="A", address="new", _sheet_pos=1),
        ]
    )
    out = enrich_transactions(txn, products, customers)
    rows = out.collect()
    # unknown product + unknown customer dropped; dup dim deduped (no fan-out)
    assert [r.transaction_id for r in rows] == ["T1"]
    assert rows[0].address == "new"

    strict = enrich_transactions(txn, products, customers, strict_compat=True)
    assert strict.count() == 2  # fan-out preserved in compat mode


def test_excel_serial_codecs(spark):
    r = (
        spark.range(1)
        .select(
            excel_serial_to_date(F.lit(45227)).alias("d"),
            excel_serial_to_timestamp(F.lit("43899.6575694444")).alias("ts"),
            null_safe_double(F.lit("abc")).alias("bad"),
            null_safe_double(F.lit("1.5")).alias("good"),
        )
        .collect()[0]
    )
    assert str(r.d) == "2023-10-28"
    assert str(r.ts) == "2020-03-09 15:46:54"
    assert r.bad is None and r.good == 1.5


def test_global_row_number_matches_single_window(spark):
    """Two-phase global row_number ≡ the naive single-partition
    row_number() OVER (ORDER BY ...) on a total order."""
    from pyspark.sql import Window

    from py_data_pipeline_app_spark.operators.ranking import global_row_number

    df = spark.createDataFrame(
        [(i, float((i * 37) % 19)) for i in range(200)], "id long, v double"
    )
    got = {
        r.id: r.rn
        for r in global_row_number(
            df, [("v", True), ("id", False)], num_partitions=7
        ).collect()
    }
    w = Window.orderBy(F.col("v").desc(), F.col("id").asc())
    exp = {
        r.id: r.rn
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == exp


def test_equi_depth_buckets_sizes_and_order(spark):
    from py_data_pipeline_app_spark.operators.ranking import equi_depth_buckets

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(25)], "id long, v double"
    )
    rows = equi_depth_buckets(
        df, [("v", True), ("id", False)], k=4, num_partitions=5
    ).collect()
    sizes = {}
    for r in rows:
        sizes[r.bucket] = sizes.get(r.bucket, 0) + 1
    # 25 rows / 4 buckets: sizes differ by at most one
    assert sorted(sizes) == [1, 2, 3, 4]
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # monotone: higher v -> lower-or-equal bucket index
    by_v = sorted(rows, key=lambda r: -r.v)
    buckets = [r.bucket for r in by_v]
    assert buckets == sorted(buckets)


def test_global_row_number_avoids_full_single_partition_sort(spark):
    """The big relation never passes through Exchange SinglePartition —
    only the P-row offsets summary does (its window is the one serial
    step, bounded by shuffle-partitions)."""
    import contextlib
    import io

    from py_data_pipeline_app_spark.operators.ranking import global_row_number

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id long, v double"
    )
    out = global_row_number(df, [("v", True), ("id", False)], num_partitions=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # at most one SinglePartition exchange (the P-row offsets summary);
    # the data-sized relation enters via the range-partitioned
    # checkpoint (shown as an ExistingRDD scan), never a global sort
    assert plan.count("Exchange SinglePartition") <= 1
    assert "Scan ExistingRDD" in plan
