"""Skew-mitigation operators: salted shuffle join and two-phase
(salted) aggregation (extension — no reference evidence; the
reference's pandas joins are single-process and skew-blind).

At 100 TB the enemy is the straggler task: a shuffle join or groupBy
hash-partitions by key, so one viral key (the whale customer, the
empty-string document, the 'en' language) lands its entire volume on
ONE reducer while 999 executors idle. First-line defense is AQE
(``spark.sql.adaptive.skewJoin.enabled`` splits oversized partitions
at runtime); these operators are the explicit fallback for the cases
AQE can't rewrite — a single join key bigger than one executor, or a
non-splittable aggregation buffer (collect_list / count distinct).

Mechanics of ``salted_join``: the big (skewed) side gets a
deterministic salt in [0, n) derived from a high-cardinality column,
widening each join key into n sub-keys; the small side is exploded n
ways so every (key, salt) pair still meets its match. Join output is
row-for-row identical to the plain join — verified by the parity
oracle — but the shuffle now spreads each hot key over n reducers.
Cost: small side replicated n×; choose n ~ (hot-key rows / rows per
healthy task).

``salted_agg`` is the same idea for re-aggregable aggregates:
groupBy(key, salt) partial → groupBy(key) combine. Spark's hash
aggregate already does map-side partials, so this only pays off when
the REDUCE side per-key state is the bottleneck (giant arrays,
distinct sets) — documented here as the pattern, exercised by tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(df: DataFrame, salt_from: str, n: int) -> Column:
    """Deterministic salt in [0, n): xxhash64 of a high-cardinality
    column (NOT the join key — salting by the key would put the whole
    hot key back in one bucket)."""
    return F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side's hot
    keys spread over ``n_salts`` reducers.

    ``salt_from`` names a high-cardinality column of ``big`` (a row
    id / event id) whose hash distributes the hot key's rows evenly.
    The small side is exploded ``n_salts``× (one copy per salt value)
    so the join remains an equi-join on ``(key, salt)`` — Catalyst
    still plans a hash join, filters still push through, and results
    are exactly those of ``big.join(small, key, how)``.
    """
    b = big.withColumn("_salt", _salt(big, salt_from, n_salts))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str] | None = None,
    counts: bool = True,
    salt_from: str | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: partial groupBy(keys + salt), then
    combine groupBy(keys). ``sums`` maps output alias -> input column
    (decimal-summed for order-independence); ``counts=True`` adds an
    ``n`` row count. Result is identical to the direct groupBy —
    the salt only bounds per-task reduce state.
    """
    sums = sums or {}
    salt_col = (
        _salt(df, salt_from, n_salts)
        if salt_from
        else F.pmod(F.xxhash64(*[F.col(k) for k in df.columns]), F.lit(n_salts))
    )
    partial_aggs = [
        F.sum(F.col(src).cast("decimal(18,6)")).alias(f"_p_{alias}")
        for alias, src in sums.items()
    ]
    if counts:
        partial_aggs.append(F.count(F.lit(1)).alias("_p_n"))
    partial = df.withColumn("_salt", salt_col.cast("int")).groupBy(
        *keys, "_salt"
    ).agg(*partial_aggs)
    final_aggs = [F.sum(f"_p_{alias}").alias(alias) for alias in sums]
    if counts:
        final_aggs.append(F.sum("_p_n").alias("n"))
    return partial.groupBy(*keys).agg(*final_aggs)
