"""Adversarial percentile parity (round-2 verdict stretch, commit 448b849's
o6 scale note): Spark's exact ``percentile`` and DuckDB's ``quantile_cont``
must agree bit-for-4dp on the distributions that break naive interpolation
— all-ties, tiny groups, duplicate values straddling the quantile position,
heavy skew — and the o6 confidence aggregation must hold at sf0.1, not just
the driver's sf0.01 gate.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

CASES = {
    "all_ties": [7.5] * 50,
    "single": [0.3],
    "pair": [0.0, 1.0],
    "dup_at_quantile": [0.0] * 10 + [0.5] * 3 + [1.0] * 10,
    "skew_outlier": [0.001 * i for i in range(99)] + [1e6],
    "negatives": [-5.0, -1.0, -1.0, 0.0, 2.0],
    "near_equal_floats": [0.1 + 1e-12 * i for i in range(20)],
}
QUANTILES = [0.0, 0.1, 0.5, 0.9, 0.99, 1.0]


@pytest.mark.parametrize("name", sorted(CASES))
def test_exact_percentile_matches_quantile_cont(spark, name):
    vals = CASES[name]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.agg(
        *[
            F.round(F.expr(f"percentile(v, {q})"), 4).alias(f"q{i}")
            for i, q in enumerate(QUANTILES)
        ]
    ).first()
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = con.execute(
        "SELECT "
        + ", ".join(f"round(quantile_cont(v, {q}), 4)" for q in QUANTILES)
        + " FROM t"
    ).fetchone()
    assert tuple(got) == pytest.approx(tuple(want), abs=1e-9), name


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.1"), reason="sf0.1 not present"
)
def test_o6_confidence_agg_at_sf01(spark):
    """The o6 oracle match replayed at 10x the driver's gate scale."""
    from doc_parser_spark.plans.driver_queries import ORACLES, QUERIES

    sf = "/root/testdata/sf0.1"
    got = (
        QUERIES["o6_confidence_agg"](spark, sf)
        .toPandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = (
        con.execute(ORACLES["o6_confidence_agg"])
        .fetchdf()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    got = got[sorted(got.columns)].astype(str)
    want = want[sorted(want.columns)].astype(str)
    assert got.equals(want)
