"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric", "value" (total sec), "unit": "sec",
"queries": {name: sec}, "sf"}. The driver runs this per round; the
N-vs-4N scaling evidence lives in scripts/scaling_bench.py → BENCH/.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from dts.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("dts-bench")

    import __spark_entry__ as entrymod

    timings: dict[str, float] = {}
    # Warm the JVM/Python workers once (session init otherwise lands on q1).
    spark.range(1000).select(F.sum("id")).collect()

    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "dts_probe_suite_e2e",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
