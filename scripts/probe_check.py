"""Local replica of the driver's correctness gate: run queries()[name]
on Spark and oracle_sql()[name] on DuckDB over the same sf dir, compare
rows / schema / value-hash with the driver's rules (columns sorted by
name, values hashed row-wise after a canonical sort).

Usage: python scripts/probe_check.py [sf_dir] [probe ...]
  (no probes → all; default sf_dir /root/testdata/sf0.01)
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    parts = []
    for _, row in df.iterrows():
        parts.append("|".join(repr(v) for v in row.tolist()))
    return hashlib.md5("\n".join(parts).encode()).hexdigest()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]

    import __spark_entry__ as m
    from dts.session import get_spark

    spark = get_spark("probe_check", master="local[8]")
    qs, os_ = m.queries(), m.oracle_sql()
    if not names:
        names = list(qs)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    n_bad = 0
    for name in names:
        try:
            got = canon(qs[name](spark, sf_dir).toPandas())
            if name not in os_:
                print(f"{name}: rows={len(got)} (no oracle — rows-only)")
                continue
            want = canon(con.execute(os_[name]).fetchdf())
            rows = len(got) == len(want)
            schema = list(got.columns) == list(want.columns) and all(
                str(a) == str(b) for a, b in zip(got.dtypes, want.dtypes)
            )
            h = value_hash(got) == value_hash(want)
            ok = rows and schema and h
            n_bad += not ok
            print(
                f"{name}: rows={rows}({len(got)}/{len(want)}) "
                f"schema={schema} hash={h} -> {'OK' if ok else 'FAIL'}"
            )
            if not schema:
                print("  spark:", dict(zip(got.columns, map(str, got.dtypes))))
                print("  duck :", dict(zip(want.columns, map(str, want.dtypes))))
            if rows and schema and not h:
                neq = (got != want) & ~(got.isna() & want.isna())
                bad_cols = [c for c in got.columns if neq[c].any()]
                print("  differing cols:", bad_cols)
                for c in bad_cols[:2]:
                    i = neq[c].idxmax()
                    print(f"  first diff {c}[{i}]: {got[c][i]!r} vs {want[c][i]!r}")
        except Exception as e:  # noqa: BLE001 — report and continue
            n_bad += 1
            print(f"{name}: ERROR {type(e).__name__}: {e}")
    print(f"{'ALL OK' if not n_bad else f'{n_bad} FAILURES'} / {len(names)}")


if __name__ == "__main__":
    main()
