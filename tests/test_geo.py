"""Geo queries vs a pure-python haversine replay."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dts.geo import EARTH_RADIUS_M, geo_bounding_box_docs, geo_distance_topk


def _hav(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp, dl = p2 - p1, math.radians(lon2) - math.radians(lon1)
    a = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * EARTH_RADIUS_M * math.asin(math.sqrt(a))


@pytest.fixture(scope="module")
def geo_docs(spark):
    rows = [
        (i, ((i * 37) % 170) - 85.0, ((i * 73) % 360) - 180.0)
        for i in range(60)
    ] + [(100, None, 5.0), (101, 5.0, None)]
    return spark.createDataFrame(rows, "doc_id long, lat double, lon double"), rows


def test_geo_bbox(spark, geo_docs):
    docs, rows = geo_docs
    got = {
        r["doc_id"]
        for r in geo_bounding_box_docs(
            docs, "lat", "lon", top=40.0, left=-90.0, bottom=-40.0, right=90.0
        ).collect()
    }
    want = {
        i for i, la, lo in rows
        if la is not None and lo is not None
        and -40 <= la <= 40 and -90 <= lo <= 90
    }
    assert got == want
    with pytest.raises(ValueError):
        geo_bounding_box_docs(docs, "lat", "lon", 1, 10, 0, -10)


def test_geo_distance_topk(spark, geo_docs):
    docs, rows = geo_docs
    got = geo_distance_topk(
        docs, "lat", "lon", origin_lat=0.0, origin_lon=0.0, k=8,
    ).collect()
    want = sorted(
        (
            (round(_hav(0.0, 0.0, la, lo), 3), i)
            for i, la, lo in rows
            if la is not None and lo is not None
        )
    )[:8]
    assert [(r["doc_id"], r["dist3"]) for r in sorted(got, key=lambda r: r["rank"])] == [
        (i, d) for d, i in want
    ]
    # radius filter is inclusive at the rounded value
    rad = want[3][0]
    within = geo_distance_topk(
        docs, "lat", "lon", 0.0, 0.0, k=100, radius_m=rad
    ).collect()
    assert len(within) == sum(1 for d, _ in want if d <= rad) or len(within) >= 4


def test_geo_distance_topk_distributed_plan(spark, geo_docs):
    # Round-6: the top-k must compile to TakeOrderedAndProject
    # (per-partition heaps), never a corpus-wide single-partition window
    # sort; the rank window runs over the already-limited k rows.
    docs, _ = geo_docs
    df = geo_distance_topk(docs, "lat", "lon", 0.0, 0.0, k=8)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")
    assert "Exchange" not in plan.split("TakeOrderedAndProject")[-1]
