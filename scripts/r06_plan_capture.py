"""Capture .explain("formatted") of declared probes → plans/r06/.

Usage: python scripts/r06_plan_capture.py <suffix> [probe ...]
  suffix: "before" or "after"; no probes → the round-6 touched set.
Writes plans/r06/<probe>_<suffix>.txt. Uses sf0.01 (plan shape is
scale-invariant; the fixtures build fast there).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_PROBES = [
    "geo_distance",
    "sorted_fetch",
    "gopher_quality",
]


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_PROBES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    import __spark_entry__ as m
    from dts.session import get_spark

    spark = get_spark("r06_plans", master="local[8]")
    qs = m.queries()
    os.makedirs(f"{REPO}/plans/r06", exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        out = f"{REPO}/plans/r06/{name}_{suffix}.txt"
        with open(out, "w") as f:
            f.write(plan_of(df))
        print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
