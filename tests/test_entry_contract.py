"""Emulates the driver's correctness harness: run each __spark_entry__
probe on sf0.01 AND its DuckDB oracle SQL, compare row count + schema-ish
+ order-insensitive values (columns sorted by name, rows sorted)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_every_query_is_checked():
    """Every queries() entry has a DuckDB oracle (round 2: lsh_ann_topk
    gained one via md5-derived hyperplanes)."""
    assert set(entrymod.queries()) == set(entrymod.oracle_sql())


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_probe_matches_oracle(spark, ddb, name):
    spark_df = entrymod.queries()[name](spark, SF_DIR).toPandas()
    oracle_df = ddb.execute(entrymod.oracle_sql()[name]).df()
    assert len(spark_df) == len(oracle_df), (
        f"{name}: rowcount {len(spark_df)} vs {len(oracle_df)}"
    )
    assert len(spark_df) > 0, f"{name}: empty result"
    a, b = _norm(spark_df), _norm(oracle_df)
    assert list(a.columns) == list(b.columns), f"{name}: columns {a.columns} vs {b.columns}"
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) or isinstance(y, float):
                # NULL float columns (open-ended range bounds) surface as
                # NaN in BOTH frames; the driver's repr-hash treats them
                # equal, so must this comparison (isclose(nan, nan) is
                # False by definition).
                both_nan = (
                    isinstance(x, float)
                    and isinstance(y, float)
                    and math.isnan(x)
                    and math.isnan(y)
                )
                assert both_nan or math.isclose(
                    float(x), float(y), rel_tol=1e-12, abs_tol=1e-12
                ), f"{name}.{col}[{i}]: {x} vs {y}"
            else:
                assert x == y, f"{name}.{col}[{i}]: {x!r} vs {y!r}"




def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) > 0
    assert set(out.columns) == {"query_id", "doc_id", "score6", "rank"}
